"""Build the native shared library (g++, no external deps).

Compiled lazily on first use and cached next to the sources; rebuilt when
the source is newer than the library.
"""

import os
import subprocess
import threading

_LOCK = threading.Lock()
_DIR = os.path.dirname(os.path.abspath(__file__))

SOURCES = ["cocoeval.cpp", "match_engine.cpp"]
LIB_NAME = "libpodnative.so"


def library_path() -> str:
    return os.path.join(_DIR, LIB_NAME)


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    lib = library_path()
    srcs = [os.path.join(_DIR, s) for s in SOURCES if os.path.isfile(os.path.join(_DIR, s))]
    with _LOCK:
        if (
            not force
            and os.path.isfile(lib)
            and all(os.path.getmtime(lib) >= os.path.getmtime(s) for s in srcs)
        ):
            return lib
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            *srcs, "-o", lib,
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return lib
