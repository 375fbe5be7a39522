"""Build/version identification — equivalent of the reference's CMake
configure_file git-SHA embedding (reference: CMakeLists.txt:37-40,
src/common/version.cpp.in)."""
from __future__ import annotations

import functools
import os
import subprocess

VERSION = "0.2.0"


@functools.lru_cache(maxsize=1)
def git_sha() -> str:
    try:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=root,
            stderr=subprocess.DEVNULL).decode().strip()
    except Exception:
        return "unknown"


def version_string() -> str:
    return f"dvbs2_tpu {VERSION} ({git_sha()})"
