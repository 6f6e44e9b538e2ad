from .curation import asset_feature_stream, curated_document_stream  # noqa: F401
from .ingest import (  # noqa: F401
    conditioned_file_stream,
    tumbling_block_stream,
    watermarked_dedupe,
    write_bronze,
    write_toa5_block_files,
)
