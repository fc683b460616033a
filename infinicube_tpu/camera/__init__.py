from infinicube_tpu.camera.conventions import opencv_to_flu, flu_to_opencv  # noqa: F401
from infinicube_tpu.camera.pinhole import PinholeCamera  # noqa: F401
from infinicube_tpu.camera import projection  # noqa: F401
