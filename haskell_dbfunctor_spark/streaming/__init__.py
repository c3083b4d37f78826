from .tailer import tail_feed_dir  # noqa: F401
