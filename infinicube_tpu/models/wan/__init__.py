from infinicube_tpu.models.wan.dit import WanDiT, WanDiTConfig  # noqa: F401
from infinicube_tpu.models.wan.flow_match import FlowMatchSchedule  # noqa: F401
