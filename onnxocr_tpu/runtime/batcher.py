"""Cross-request micro-batching in front of the single TPU.

The reference gates concurrent requests with a semaphore and runs them
back-to-back (app/engine.py:37,111). On TPU the better shape is a batching
queue: concurrent requests' crop batches of the SAME width bucket are
concatenated into one device call, padded up the batch ladder, and the
results split back — MXU utilization grows with load instead of queueing
latency.

Generic over the stage function: anything of the form
    fn(batch_input (B, ...)) → pytree of arrays with leading dim B.
Enabled for the service via Settings.MODEL_CONCURRENCY > 1 (engine wires
RecForward/ClsForward through a MicroBatcher per stage).
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax


class _Work:
    __slots__ = ("item", "event", "result", "error")

    def __init__(self, item):
        self.item = item
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None


class MicroBatcher:
    def __init__(self, fn: Callable, max_batch: int = 64,
                 max_wait_ms: float = 4.0,
                 batch_ladder: Sequence[int] = (1, 2, 4, 8, 16, 32, 64)):
        self.fn = fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.batch_ladder = tuple(batch_ladder)
        self._q: "queue.Queue[_Work]" = queue.Queue()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="ocr-microbatcher")
        self._thread.start()

    def close(self):
        self._stop = True
        self._q.put(None)  # wake
        self._thread.join(timeout=2)

    def submit(self, item: np.ndarray):
        """Blocking: item (B, ...) → fn's output sliced back to B rows."""
        work = _Work(np.asarray(item))
        self._q.put(work)
        work.event.wait()
        if work.error is not None:
            raise work.error
        return work.result

    # ------------------------------------------------------------ internals
    def _loop(self):
        while not self._stop:
            work = self._q.get()
            if work is None:
                continue
            batch: List[_Work] = [work]
            total = work.item.shape[0]
            deadline = None
            while total < self.max_batch:
                try:
                    timeout = self.max_wait if deadline is None else \
                        max(0.0, deadline)
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    break
                deadline = 0.0  # only wait once per batch
                batch.append(nxt)
                total += nxt.item.shape[0]
            self._run(batch)

    def _run(self, batch: List[_Work]):
        # group by trailing shape (same bucket) — different buckets run
        # separately but still amortize dispatch.
        groups: Dict[tuple, List[_Work]] = {}
        for w in batch:
            groups.setdefault(w.item.shape[1:], []).append(w)
        for shape, works in groups.items():
            try:
                arrays = [w.item for w in works]
                n = sum(a.shape[0] for a in arrays)
                bsz = next((b for b in self.batch_ladder if n <= b),
                           self.batch_ladder[-1])
                if bsz < n:
                    bsz = n
                stacked = np.concatenate(arrays, axis=0)
                if bsz > n:
                    pad = np.zeros((bsz - n,) + shape, stacked.dtype)
                    stacked = np.concatenate([stacked, pad], axis=0)
                out = self.fn(stacked)
                out_np = jax.tree_util.tree_map(np.asarray, out)
                off = 0
                for w in works:
                    k = w.item.shape[0]
                    w.result = jax.tree_util.tree_map(
                        lambda a: a[off:off + k], out_np)
                    off += k
                    w.event.set()
            except BaseException as e:  # propagate to all waiters
                for w in works:
                    if not w.event.is_set():
                        w.error = e
                        w.event.set()


class DetPageBatcher:
    """Cross-request detector batching (SURVEY §7 "kill the per-image
    session-run pattern"): each page is resized on host with the exact
    reference arithmetic (det_pre.prepare_det_input) into ONE fixed det
    canvas — so the only compile axis is the batch ladder — and concurrent
    pages run the DBNet forward as a single device call via a MicroBatcher.

    Only valid for limit_type='max' (the canvas bounds the resize target);
    callers fall back to the unbatched path otherwise.
    """

    def __init__(self, det_forward, limit_side_len: float = 960,
                 limit_type: str = "max", max_wait_ms: float = 8.0,
                 batch_ladder: Sequence[int] = (1, 2, 4, 8), mesh=None):
        from ..ops import det_pre
        assert limit_type == "max"
        self.forward = det_forward
        self.limit_side_len = limit_side_len
        self.limit_type = limit_type
        self.side = det_pre.round_up(int(limit_side_len), 32)
        fn = det_forward.call_pages_u8
        if mesh is not None:
            # multi-chip serving: shard the page batch over the mesh's
            # `data` axis — weights replicate, XLA partitions the batch,
            # no collectives (embarrassingly parallel inference). The
            # ladder is padded to multiples of the data-axis size.
            fn = self._make_sharded_fn(mesh)
            n_data = mesh.shape["data"]
            batch_ladder = tuple(sorted({
                max(n_data, ((b + n_data - 1) // n_data) * n_data)
                for b in batch_ladder}))
        self.batcher = MicroBatcher(fn,
                                    max_batch=batch_ladder[-1],
                                    max_wait_ms=max_wait_ms,
                                    batch_ladder=batch_ladder)

    def _make_sharded_fn(self, mesh):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel import mesh as mesh_lib

        fwd = self.forward
        params_sharded = None

        def fn(pages_u8):
            nonlocal params_sharded
            if params_sharded is None and fwd.backend == "native":
                params_sharded = jax.device_put(fwd.params,
                                                mesh_lib.replicated(mesh))
            if getattr(fn, "_jit", None) is None:
                from ..ops import det_pre
                from ..models import dbnet
                import jax.numpy as jnp

                def impl(params, pages):
                    x = det_pre.normalize_det(pages).astype(fwd.dtype)
                    prob = dbnet.apply(params, x, backbone_arch=fwd.arch)
                    return fwd._encode(prob.astype(jnp.float32))

                fn._jit = jax.jit(
                    impl,
                    in_shardings=(mesh_lib.replicated(mesh),
                                  NamedSharding(mesh,
                                                P("data", None, None, None))),
                    out_shardings=NamedSharding(mesh, P("data", None, None)))
            return fn._jit(params_sharded, pages_u8)

        return fn

    def close(self):
        self.batcher.close()

    def submit(self, img: np.ndarray):
        """BGR page → (prob_map (rh, rw) float32, shape_info)."""
        from ..ops import det_pre
        padded, shape_info, (rh, rw) = det_pre.prepare_det_input(
            img, self.limit_side_len, self.limit_type, bucket=self.side)
        if padded.shape[:2] != (self.side, self.side):
            # defensive: an off-canvas resize target (shouldn't happen for
            # limit_type='max') runs unbatched
            out = np.asarray(self.forward(padded))
            return self.forward.decode_map(out)[:rh, :rw], shape_info
        out = self.batcher.submit(padded[None])
        return self.forward.decode_map(np.asarray(out[0]))[:rh, :rw], \
            shape_info


class BatchedForward:
    """Wrap a *Forward so its __call__ goes through a MicroBatcher."""

    def __init__(self, forward, max_batch: int = 64,
                 max_wait_ms: float = 4.0):
        self.forward = forward
        self.batcher = MicroBatcher(forward, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms)

    def __getattr__(self, name):
        return getattr(self.forward, name)

    def __call__(self, crops):
        return self.batcher.submit(np.asarray(crops))
