from .normalize import normalize_turns, normalize_expr  # noqa: F401
from .conv_records import build_conv_records, collect_tool_vocab  # noqa: F401
