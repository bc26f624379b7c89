"""Default-suite device-alignment kernel cases (VERDICT r3 item 5).

Runs ONE real interpret-mode extd2 and exts2 case in every default
`pytest tests/` via the shipped compile cache (tests/data/jaxcache/,
rebuilt by tools/build_test_cache.py).  When the manifest's jaxlib
version drifts from the installed one the cached executables cannot
load and a cold compile would take minutes — the tests then skip with a
pointer to the builder (CI's slow job still covers the kernels).
"""

import json
import os
import sys

import numpy as np  # noqa: F401  (micro module needs it importable)
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "data", "jaxcache")


def _cache_usable() -> bool:
    man = os.path.join(CACHE_DIR, "MANIFEST.json")
    if not os.path.exists(man):
        return False
    try:
        import jaxlib
        with open(man) as f:
            meta = json.load(f)
        return meta.get("jaxlib") == jaxlib.__version__
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not (_cache_usable() or os.environ.get("MM2TPU_RUN_SLOW")),
    reason="shipped jaxcache manifest missing or jaxlib drifted; "
           "regenerate with tools/build_test_cache.py")


@pytest.fixture(autouse=True)
def _use_shipped_cache(monkeypatch):
    # route the XLA compile cache at the shipped blobs for these cases
    import jax
    prev = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_micro_extd2_interpret():
    import _ksw2_micro as M
    got, want = M.run_extd2(interpret=True)
    M.check(got, want)


def test_micro_exts2_interpret():
    import _ksw2_micro as M
    got, want = M.run_exts2(interpret=True)
    M.check(got, want)
