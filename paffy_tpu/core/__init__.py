from paffy_tpu.core.model import PafTable, MATCH, QUERY_INSERT, QUERY_DELETE, SEQ_MATCH, SEQ_MISMATCH, INT_MAX  # noqa: F401
