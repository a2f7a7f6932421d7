from .io import read_transcripts, read_table, write_stage  # noqa: F401
