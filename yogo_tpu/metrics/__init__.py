from yogo_tpu.metrics.metrics import Metrics  # noqa: F401
from yogo_tpu.metrics.device_metrics import DeviceMetrics  # noqa: F401
from yogo_tpu.metrics.mean_ap import MeanAveragePrecision  # noqa: F401
from yogo_tpu.metrics.matching import linear_sum_assignment  # noqa: F401
