from .checkpoint import (done_buckets, read_result,  # noqa: F401
                         run_stage_with_checkpoint, run_with_checkpoint)
from .metrics import lineage_row, metrics_from_fused, new_run_id  # noqa: F401
from .salt import bucket_of, defuse_skew  # noqa: F401
