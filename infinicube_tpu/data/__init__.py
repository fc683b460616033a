from infinicube_tpu.data.specs import DatasetSpec, list_collate  # noqa: F401
from infinicube_tpu.data.tario import TarReader, TarWriter  # noqa: F401
