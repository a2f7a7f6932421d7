from .checkpoint import CheckpointManager
from .linkage import link_transcripts

__all__ = ["CheckpointManager", "link_transcripts"]
