from .readers import (from_iterable, from_pandas, read_pages_parquet,  # noqa: F401
                      read_pages_table, read_pdf_files)
from .writers import (to_iterable, to_pandas, write_files,  # noqa: F401
                      write_texts_parquet)
