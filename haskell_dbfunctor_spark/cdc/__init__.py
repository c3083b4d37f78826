from .generator import TRANSCRIPT_SCHEMA, change_feed, epoch_ids
from .apply import replay, open_or_create_transcripts

__all__ = [
    "TRANSCRIPT_SCHEMA",
    "change_feed",
    "epoch_ids",
    "replay",
    "open_or_create_transcripts",
]
