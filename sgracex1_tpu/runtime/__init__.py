"""Native host runtime (C++ fast paths for parsing / preprocessing)."""

from sgracex1_tpu.runtime.native import available, get_lib  # noqa: F401
