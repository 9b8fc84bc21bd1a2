from st_dadk_tpu.utils.metrics import compute_metrics, compute_spatial_metrics, print_metrics  # noqa: F401
from st_dadk_tpu.utils.io import save_json, json_safe  # noqa: F401
