from .aggregator import aggregate  # noqa: F401
from .classifiers import (dummy_classify, mask_classify, masks_df,  # noqa: F401
                          random_classify)
from .extractor import blocs, doc_summaries, extract  # noqa: F401
from .fused import PipelineConfig, process_doc, run_fused  # noqa: F401
