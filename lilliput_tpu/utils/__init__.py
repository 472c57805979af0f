from .metrics import Metrics, StageTimer, metrics  # noqa: F401
from .logging import get_logger  # noqa: F401
from .profiling import device_trace, measure_device_stages  # noqa: F401
