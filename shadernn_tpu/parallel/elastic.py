"""Elastic execution: device-failure detection, exclusion, and mesh rebuild.

The reference has no failure story (SNN_RIP aborts, utils.h:58-61;
single device). A multi-host TPU serving deployment needs at least:
detect a failed or HUNG step, drop the failed chip, rebuild the mesh over
the survivors, recompile, resume (SURVEY.md §5 "detect host failure and
rebuild the mesh").

`ElasticEngine` wraps engine construction:

- every step's device-sync runs under a **watchdog thread**
  (`step_timeout_s`): a hung collective (the classic multi-chip failure
  mode — one peer stops participating and everyone else blocks in the
  all-reduce) surfaces as `StepTimeout` instead of blocking forever;
- on a failure the suspect device is **excluded** from the rebuild mesh
  (`mark_failed`, or auto-parsed from the exception when the runtime
  names a device) — a genuinely dead chip is never re-included;
- the data-parallel degree is re-planned over the surviving devices (the
  only axis whose loss is capacity rather than correctness) and the failed
  batch replays on the new engine.

Failures are injectable for testing (`inject_failure(device=...)`).
"""

from __future__ import annotations

import dataclasses
import re
import threading
from typing import Callable, Dict, Optional, Set

import jax
import numpy as np

from shadernn_tpu.config import EngineOptions, ShardingOptions
from shadernn_tpu.engine.engine import Engine
from shadernn_tpu.parallel.mesh import make_mesh
from shadernn_tpu.utils import get_logger

logger = get_logger("snn_tpu.elastic")


class StepTimeout(RuntimeError):
    """A step exceeded the watchdog deadline (hung collective / dead chip)."""


class RuntimeWedged(RuntimeError):
    """Too many watchdog waiters stuck inside the runtime: local recovery
    (rebuild/shrink) cannot help; the process must be restarted. Fatal —
    never swallowed by the recovery loop."""


# Exception types treated as device/runtime failures worth a rebuild.
_FAILURE_TYPES = (RuntimeError, jax.errors.JaxRuntimeError, OSError, StepTimeout)

# Runtime errors sometimes name the device ("TPU_3", "device 3", ...);
# best-effort extraction so the right chip gets excluded.
_DEVICE_RE = re.compile(r"(?:TPU|device)[ _:]*(\d+)", re.IGNORECASE)


class ElasticEngine:
    def __init__(
        self,
        graph_builder: Callable[[], object],
        options: EngineOptions,
        max_rebuilds: int = 3,
        step_timeout_s: Optional[float] = 120.0,
    ):
        """graph_builder: zero-arg callable producing a fresh Graph (graphs
        are consumed by compilation; a rebuild needs a new one).
        step_timeout_s: watchdog deadline per step; None disables."""
        self._builder = graph_builder
        self._options = options
        self._max_rebuilds = max_rebuilds
        self.step_timeout_s = step_timeout_s
        self.rebuilds = 0
        self.failures = 0
        self.excluded_ids: Set[int] = set()
        self._fail_next = 0  # test hooks
        self._fail_device: Optional[int] = None
        self._leaked: list = []  # watchdog threads stuck in the runtime
        self._build()

    # -- mesh / rebuild ------------------------------------------------------
    def healthy_devices(self):
        return [d for d in jax.devices() if d.id not in self.excluded_ids]

    def mark_failed(self, device_id: int) -> None:
        """Exclude a device from every future mesh (external failure
        detectors — hardware health monitors — call this directly)."""
        self.excluded_ids.add(device_id)
        logger.warning("device %d marked failed; %d healthy remain",
                       device_id, len(self.healthy_devices()))

    def _plan_shrink(self, attributed: bool = False) -> bool:
        """Re-plan the data degree over the surviving devices. Returns
        False when no further shrink is possible. `attributed`: the failed
        device was identified and excluded — keep all capacity the
        survivors support; unattributed failures back off by half."""
        sh = self._options.sharding
        fixed = sh.model * sh.spatial
        avail = len(self.healthy_devices()) // max(fixed, 1)
        if avail < 1:
            return False
        target = min(sh.data, avail)
        if not attributed and target == sh.data and sh.data > 1:
            # unattributed failure (no device excluded): back off capacity
            target = sh.data // 2
        # largest power-of-two data degree <= target
        new_data = 1
        while new_data * 2 <= target:
            new_data *= 2
        if sh.data <= 1 and new_data <= 1:
            # single device left: rebuild in place (process-level retry)
            return self.rebuilds < self._max_rebuilds
        new_sh = dataclasses.replace(sh, data=max(new_data, 1))
        new_batch = max(
            self._options.batch_size * new_sh.data // max(sh.data, 1), 1
        )
        self._options = dataclasses.replace(
            self._options, sharding=new_sh, batch_size=new_batch
        )
        return True

    def _build(self) -> None:
        sharding = self._options.sharding
        mesh = (
            make_mesh(sharding, devices=self.healthy_devices())
            if sharding.is_sharded
            else None
        )
        self.engine = Engine.from_graph(self._builder(), self._options, mesh=mesh)
        logger.info(
            "elastic engine built: %d-way data parallel, batch %d, "
            "%d device(s) excluded",
            sharding.data, self._options.batch_size, len(self.excluded_ids),
        )

    # -- failure classification ----------------------------------------------
    def inject_failure(self, count: int = 1, device: Optional[int] = None) -> None:
        """Make the next `count` steps raise (tests the recovery path);
        `device` simulates the runtime blaming a specific chip."""
        self._fail_next += count
        self._fail_device = device

    def _on_failure(self, e: BaseException) -> bool:
        """Record the failure; returns True if a specific device was
        identified (and newly excluded)."""
        self.failures += 1
        attributed = False
        m = _DEVICE_RE.search(str(e))
        if m:
            did = int(m.group(1))
            if any(d.id == did for d in self.healthy_devices()):
                self.mark_failed(did)
                attributed = True
        logger.warning("step failed (%s: %s); rebuilding engine",
                       type(e).__name__, e)
        return attributed

    # -- execution -----------------------------------------------------------
    MAX_LEAKED_WAITERS = 4

    def _wait_with_deadline(self, fn, deadline_s: float) -> None:
        """Run fn() on a watchdog thread; StepTimeout past the deadline.
        A timed-out thread cannot be killed (it is blocked inside the
        runtime) — it is tracked in _leaked and reaped when it unwedges;
        past MAX_LEAKED_WAITERS the runtime is declared wedged beyond
        local recovery and the failure is re-raised as fatal."""
        self._leaked = [th for th in self._leaked if th.is_alive()]
        done = threading.Event()
        err: list = []

        def waiter():
            try:
                fn()
            except BaseException as we:  # surfaces via the main thread
                err.append(we)
            finally:
                done.set()

        t = threading.Thread(target=waiter, daemon=True)
        t.start()
        if not done.wait(deadline_s):
            self._leaked.append(t)
            if len(self._leaked) > self.MAX_LEAKED_WAITERS:
                raise RuntimeWedged(
                    f"{len(self._leaked)} watchdog waiters stuck in the "
                    "runtime: wedged beyond local recovery"
                )
            raise StepTimeout(
                f"step exceeded {deadline_s}s watchdog deadline "
                "(hung collective or dead device)"
            )
        if err:
            raise err[0]

    def _sync(self, out) -> None:
        """Block until device completion, under the watchdog deadline."""
        leaves = [v for v in jax.tree.leaves(out) if hasattr(v, "block_until_ready")]
        if self.step_timeout_s is None:
            for v in leaves:
                v.block_until_ready()
            return

        def wait_all():
            for v in leaves:
                v.block_until_ready()

        self._wait_with_deadline(wait_all, self.step_timeout_s)

    def _reset_backend(self) -> None:
        """Best-effort runtime refresh after a timeout: the executable
        that hung may be pinned to a wedged runtime state; clear trace and
        executable caches so the rebuild recompiles against a fresh view
        of the device set."""
        try:
            jax.clear_caches()
            logger.warning("cleared jit caches after step timeout")
        except Exception as e:  # never let cleanup mask the real failure
            logger.warning("cache clear failed: %s", e)

    def _probe_devices(self) -> bool:
        """Actively probe each healthy device with a tiny transfer+compute
        under a short deadline; exclude the ones that hang or fail. Real
        attribution, replacing trust in the error-message regex."""
        # 5s floor: a probe may pay a first-time compile, which the step
        # watchdog deadline (tuned for steady-state steps) need not cover.
        timeout = max(self.step_timeout_s or 5.0, 5.0)
        newly_failed = False
        for d in list(self.healthy_devices()):
            def probe(dev=d):
                x = jax.device_put(np.ones((8,), np.float32), dev)
                (x + 1).block_until_ready()

            try:
                self._wait_with_deadline(probe, timeout)
            except BaseException as e:
                logger.warning("device %s failed probe (%s); excluding",
                               d.id, type(e).__name__)
                self.mark_failed(d.id)
                newly_failed = True
        return newly_failed

    def run(self, inputs: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        """One step with failure recovery. The batch is re-bucketed to the
        current (possibly shrunk) batch size."""
        while True:
            try:
                if self._fail_next > 0:
                    self._fail_next -= 1
                    dev = f" on device {self._fail_device}" if self._fail_device is not None else ""
                    raise RuntimeError(f"injected device failure{dev}")
                return self._run_bucketed(inputs)
            except _FAILURE_TYPES as e:
                if isinstance(e, RuntimeWedged):
                    raise
                attributed = self._on_failure(e)
                if isinstance(e, StepTimeout):
                    # A hang gives no device in the message: refresh the
                    # runtime caches and actively probe for the dead chip
                    # instead of blindly shrinking.
                    self._reset_backend()
                    attributed = self._probe_devices() or attributed
                if (self.rebuilds >= self._max_rebuilds
                        or not self._plan_shrink(attributed)):
                    raise
                self.rebuilds += 1
                self._build()

    def _run_bucketed(self, inputs: Dict[str, np.ndarray]):
        batch = next(iter(inputs.values())).shape[0]
        step = self._options.batch_size
        if batch == step:
            out = self.engine.run(inputs)
            self._sync(out)
            return out
        # split/pad into fixed-size buckets and reassemble
        outs_parts = []
        for start in range(0, batch, step):
            chunk = {k: v[start : start + step] for k, v in inputs.items()}
            fill = next(iter(chunk.values())).shape[0]
            if fill < step:
                chunk = {
                    k: np.concatenate(
                        [v, np.repeat(v[-1:], step - fill, axis=0)]
                    )
                    for k, v in chunk.items()
                }
            out = self.engine.run(chunk)
            self._sync(out)
            outs_parts.append({k: np.asarray(v)[:fill] for k, v in out.items()
                               if k != "__dumps__"})
        return {
            k: np.concatenate([p[k] for p in outs_parts])
            for k in outs_parts[0]
        }

    @property
    def data_parallel_degree(self) -> int:
        return self._options.sharding.data
