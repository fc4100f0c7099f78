"""Pre-flight HBM guard for jitted train steps.

Round-3 lesson (CLAUDE.md): ``remat_frontend`` defaulted OFF for the
563 clips/s win, but B=264 without remat hard-crashed the TPU worker
(OOM-killed; the tunnel wedged ~25 min).  The only protection was a
docstring.  This module turns that crash class into a clean, actionable
outcome: before the FIRST dispatch of a train step, the jitted function
is AOT-lowered+compiled (that compile was going to happen anyway) and
XLA's buffer-assignment estimate is checked against the device's HBM
limit.  If the step doesn't fit and a rebuild hook is provided (the
Trainer's "re-make the step with remat_frontend=True"), the guard
rebuilds and re-checks once; if it still doesn't fit it raises
``MemoryError`` naming the numbers instead of letting the worker die.

The reference has no equivalent -- torch surfaces ``cuda OOM`` only
after the allocation fails mid-step (and DataParallel then wedges the
process group); SURVEY.md §5 failure detection.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax


def device_hbm_limit() -> Optional[int]:
    """The addressable device's memory capacity in bytes, or None when the
    backend doesn't expose it (CPU/virtual meshes)."""
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


def executable_peak_bytes(compiled) -> Optional[int]:
    """XLA's per-device memory estimate for a compiled executable:
    arguments + outputs + temporaries - aliased (donated buffers count
    once).  None when the backend doesn't implement memory_analysis."""
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    temp = getattr(ma, "temp_size_in_bytes", None)
    if temp is None:
        return None
    return (temp
            + getattr(ma, "argument_size_in_bytes", 0)
            + getattr(ma, "output_size_in_bytes", 0)
            - getattr(ma, "alias_size_in_bytes", 0))


class GuardedTrainStep:
    """Callable wrapper over a jitted train step that HBM-checks the
    compiled executable before its first dispatch.

    On the first call (per input shape signature) the step is AOT
    lowered+compiled and ``executable_peak_bytes`` is compared against
    ``device_hbm_limit() * headroom``.  Over the limit: ``rebuild`` (if
    given) is invoked once to produce a cheaper step (the Trainer passes
    a remat_frontend=True rebuild) and the check repeats; still over:
    ``MemoryError``.  Fits (or limits unavailable): the compiled
    executable is dispatched directly -- later calls with the same
    shapes reuse it, novel shapes (ragged tail batches) fall back to the
    plain jitted call.
    """

    def __init__(self, jitted: Callable, rebuild: Optional[Callable] = None,
                 logger=None, headroom: float = 0.98):
        self._jitted = jitted
        self._rebuild = rebuild
        self._logger = logger
        self._headroom = headroom
        self._compiled = None
        self._key = None
        self.rebuilt = False          # introspection for tests/logs

    def _shape_key(self, args):
        # sharding is part of the key: an executable compiled for
        # single-device inputs cannot be dispatched with mesh-sharded
        # arguments (and vice versa) -- those calls take the plain jit
        # path, which re-specializes
        return jax.tree_util.tree_map(
            lambda x: (getattr(x, "shape", None),
                       str(getattr(x, "dtype", "")),
                       str(getattr(x, "sharding", ""))),
            args)

    def _check(self, compiled, limit: int) -> Optional[str]:
        peak = executable_peak_bytes(compiled)
        if peak is None:
            return None
        budget = int(limit * self._headroom)
        if peak <= budget:
            if self._logger:
                self._logger.info(
                    f"HBM pre-flight: step needs {peak / 2**30:.2f} GiB of "
                    f"{limit / 2**30:.2f} GiB -- fits")
            return None
        return (f"train step needs {peak / 2**30:.2f} GiB but the device "
                f"has {limit / 2**30:.2f} GiB (headroom-adjusted budget "
                f"{budget / 2**30:.2f} GiB)")

    def _compile_checked(self, *args):
        compiled = self._jitted.lower(*args).compile()
        limit = device_hbm_limit()
        if limit is None:
            return compiled
        msg = self._check(compiled, limit)
        if msg is None:
            return compiled
        if self._rebuild is not None and not self.rebuilt:
            if self._logger:
                self._logger.warning(
                    f"HBM pre-flight: {msg}; retrying with "
                    f"remat_frontend=True")
            self._jitted = self._rebuild()
            self.rebuilt = True
            compiled = self._jitted.lower(*args).compile()
            msg = self._check(compiled, limit)
            if msg is None:
                return compiled
        raise MemoryError(
            f"HBM pre-flight check failed: {msg}. Reduce batch_size or "
            f"enable remat (remat_frontend/remat_decoder); the step was NOT "
            f"dispatched (an OOM dispatch can kill the TPU worker and wedge "
            f"the tunnel for ~25 min).")

    def __call__(self, *args):
        key = self._shape_key(args)
        if self._compiled is None and self._key is None:
            self._compiled = self._compile_checked(*args)
            self._key = key
        if key == self._key:
            return self._compiled(*args)
        # novel shapes (e.g. ragged tail batch): plain jit path
        return self._jitted(*args)
