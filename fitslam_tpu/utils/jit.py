"""Versioned jit: salts jitted-function names with a source hash.

The TPU backend in this environment compiles remotely and keys its
server-side binary cache by HLO module name (observed: after editing a
function body, re-jitting under the same name returned the *old* slow
binary — 33 ms — while the identical HLO under a fresh name compiled to a
0.1 ms binary). Salting every entry-point name with a hash of the package
source makes names change exactly when code changes: unchanged code reuses
good cached binaries, edited code always gets a fresh compile.
"""

from __future__ import annotations

import functools
import hashlib
import pathlib

import jax

_PKG_ROOT = pathlib.Path(__file__).resolve().parent.parent


@functools.lru_cache(maxsize=1)
def source_salt() -> str:
    h = hashlib.sha1()
    for p in sorted(_PKG_ROOT.rglob("*.py")):
        h.update(p.read_bytes())
    return h.hexdigest()[:8]


def vjit(fn=None, **jit_kwargs):
    """Drop-in replacement for jax.jit with a source-salted module name."""
    if fn is None:
        return lambda f: vjit(f, **jit_kwargs)

    @functools.wraps(fn)
    def inner(*args, **kwargs):
        return fn(*args, **kwargs)

    inner.__name__ = f"{fn.__name__}_{source_salt()}"
    inner.__qualname__ = inner.__name__
    return jax.jit(inner, **jit_kwargs)
