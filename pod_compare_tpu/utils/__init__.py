from pod_compare_tpu.utils.table import Table
from pod_compare_tpu.utils.logging import setup_logger
from pod_compare_tpu.utils.compilation_cache import enable_persistent_cache

__all__ = ["Table", "setup_logger", "enable_persistent_cache"]
