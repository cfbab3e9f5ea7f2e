from pod_compare_tpu.utils.table import Table
from pod_compare_tpu.utils.logging import setup_logger

__all__ = ["Table", "setup_logger"]
