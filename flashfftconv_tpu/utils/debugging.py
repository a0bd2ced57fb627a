"""Numerics debugging helpers.

The reference's equivalent surface is CUDA error-check macros plus NaN
breakpoints in the training loop (SURVEY.md §5.2,
standalone_cifar.py:213-223). The JAX-native tools are jax_debug_nans and
checkify; these wrappers give them a stable home in the framework.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Raise on the first NaN produced inside the context (jit-compatible)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable) -> Callable:
    """Wrap fn with checkify so NaN/OOB errors surface as Python exceptions
    with location info (instead of silent garbage)."""
    from jax.experimental import checkify

    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def assert_finite(tree, name: str = "tree") -> None:
    """Eager finiteness assertion over a pytree (the NaN-breakpoint analog)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not bool(jnp.isfinite(leaf.astype(jnp.float32)).all()):
            loc = "/".join(str(getattr(p, "key", p)) for p in path)
            raise FloatingPointError(f"non-finite values in {name}:{loc}")


def causality_leakage(f, x, positions=None):
    """Measure gradient leakage forward in time — the reference's
    CausalityMonitor (training/src/callbacks/causality_monitor.py): for a
    causal model y = f(x), dy[:, t]/dx[:, s] must vanish for all s > t.

    f: callable mapping (B, L, D) -> (B, L, ...). Returns {t: max |leak|}
    over the checked positions (default: L//4, L//2, 3L//4).
    """
    import jax
    import jax.numpy as jnp

    l = x.shape[1]
    if positions is None:
        positions = sorted({l // 4, l // 2, (3 * l) // 4})
    leaks = {}
    for t in positions:
        g = jax.grad(lambda x: f(x)[:, t].astype(jnp.float32).sum())(x)
        leaks[t] = float(jnp.abs(g[:, t + 1 :]).max()) if t + 1 < l else 0.0
    return leaks
