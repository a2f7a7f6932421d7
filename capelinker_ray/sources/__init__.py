from .io import (read_transcripts, read_table, read_labeled_pairs,  # noqa: F401
                 write_partitioned)
from .rdata import read_rda, rda_dataset  # noqa: F401
