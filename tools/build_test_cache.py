"""Build the shipped XLA compile cache for the default-suite micro
ksw2 kernel cases (tests/_ksw2_micro.py).

Interpret-mode compiles of the ksw2 Pallas kernels take minutes per
(class, band) shape on this host; shipping the compiled executables in
tests/data/jaxcache/ lets every default `pytest tests/` run exercise
one REAL extd2 and exts2 interpret case in seconds.  The manifest pins
the jaxlib version the blobs were built with — tests skip (with a
pointer here) when it drifts.

Usage:  python tools/build_test_cache.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
CACHE_DIR = os.path.join(REPO, "tests", "data", "jaxcache")

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MM2TPU_JAX_CACHE"] = CACHE_DIR
os.environ["MM2TPU_INTERPRET_MAX_CLASS"] = "512"

from mm2_gb_tpu.utils import tunnel  # noqa: E402

tunnel.force_cpu()

from mm2_gb_tpu.utils.tpucfg import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jaxlib  # noqa: E402

import _ksw2_micro as M  # noqa: E402


def main() -> int:
    os.makedirs(CACHE_DIR, exist_ok=True)
    for name, fn in (("extd2", M.run_extd2), ("exts2", M.run_exts2)):
        t0 = time.perf_counter()
        got, want = fn(interpret=True)
        M.check(got, want)
        print(f"{name}: compiled+checked in {time.perf_counter()-t0:.1f}s",
              flush=True)
    entries = sorted(f for f in os.listdir(CACHE_DIR) if f.endswith("-cache"))
    with open(os.path.join(CACHE_DIR, "MANIFEST.json"), "w") as f:
        json.dump({"jaxlib": jaxlib.__version__,
                   "python": sys.version.split()[0],
                   "entries": entries}, f, indent=1)
    total = sum(os.path.getsize(os.path.join(CACHE_DIR, e))
                for e in entries)
    print(f"{len(entries)} cache entries, {total/1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
