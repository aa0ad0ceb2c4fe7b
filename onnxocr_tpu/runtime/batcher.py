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

    def submit(self, item):
        """Blocking: item — an array (B, ...) or a pytree of arrays sharing
        the leading batch dim — → fn's output sliced back to B rows."""
        import jax
        work = _Work(jax.tree_util.tree_map(np.asarray, item))
        self._q.put(work)
        work.event.wait()
        if work.error is not None:
            raise work.error
        return work.result

    # ------------------------------------------------------------ internals
    @staticmethod
    def _batch_size(item) -> int:
        import jax
        return jax.tree_util.tree_leaves(item)[0].shape[0]

    def _loop(self):
        while not self._stop:
            work = self._q.get()
            if work is None:
                continue
            batch: List[_Work] = [work]
            total = self._batch_size(work.item)
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
                total += self._batch_size(nxt.item)
            self._run(batch)

    @staticmethod
    def _group_key(item):
        leaves, treedef = jax.tree_util.tree_flatten(item)
        return (treedef,
                tuple((a.shape[1:], a.dtype.str) for a in leaves))

    def _run(self, batch: List[_Work]):
        # group by structure + trailing shapes (same bucket) — different
        # buckets run separately but still amortize dispatch.
        groups: Dict[tuple, List[_Work]] = {}
        for w in batch:
            groups.setdefault(self._group_key(w.item), []).append(w)
        for _key, works in groups.items():
            try:
                sizes = [self._batch_size(w.item) for w in works]
                n = sum(sizes)
                bsz = next((b for b in self.batch_ladder if n <= b),
                           self.batch_ladder[-1])
                if bsz < n:
                    bsz = n

                def stack(*leaves):
                    out = np.concatenate(leaves, axis=0)
                    if bsz > n:
                        pad = np.zeros((bsz - n,) + out.shape[1:],
                                       out.dtype)
                        out = np.concatenate([out, pad], axis=0)
                    return out

                stacked = jax.tree_util.tree_map(
                    stack, works[0].item, *[w.item for w in works[1:]])
                out = self.fn(stacked)
                out_np = jax.tree_util.tree_map(np.asarray, out)
                off = 0
                for w, k in zip(works, sizes):
                    w.result = jax.tree_util.tree_map(
                        lambda a, o=off, kk=k: a[o:o + kk], out_np)
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
                 batch_ladder: Sequence[int] = (1, 2, 4, 8), mesh=None,
                 post=None, max_boxes: int = 256, bucket: int = 320):
        assert limit_type == "max"
        self.forward = det_forward
        self.limit_side_len = limit_side_len
        self.limit_type = limit_type
        self.bucket = bucket
        self.post = post
        if post is not None:
            # boxes mode: det forward AND DB box extraction run on device
            # per batch; submit_boxes returns unpacked source-coord quads
            fn = det_forward.make_pages_boxes_fn(post, max_boxes)
            mesh = None  # sharded variant of the boxes program: not yet
        else:
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

    # NOTE canvas bucketing: pages are padded to the same per-page
    # /det-bucket canvas the unbatched host path uses (NOT one fixed
    # max canvas). The backbone's SE blocks take GLOBAL average pools, so
    # activations depend on how much zero padding the canvas carries —
    # page batches group by canvas shape (the MicroBatcher's group key) to
    # keep batched outputs equal to the unbatched path.
    def _prepare(self, img: np.ndarray):
        from ..ops import det_pre
        return det_pre.prepare_det_input(
            img, self.limit_side_len, self.limit_type, bucket=self.bucket)

    def submit(self, img: np.ndarray):
        """BGR page → (prob_map (rh, rw) float32, shape_info)."""
        padded, shape_info, (rh, rw) = self._prepare(img)
        out = self.batcher.submit(padded[None])
        out0 = out[0]
        if not isinstance(out0, np.ndarray):
            out0 = np.asarray(out0[:rh, :rw])  # device-side slice
        else:
            out0 = out0[:rh, :rw]
        return self.forward.decode_map(out0), shape_info

    def submit_boxes(self, img: np.ndarray) -> np.ndarray:
        """BGR page → (N, 4, 2) int32 quads in source coords (boxes mode:
        batched forward + on-device DB extraction, ops/db_device.py)."""
        from ..ops import db_device
        assert self.post is not None
        padded, _info, (rh, rw) = self._prepare(img)
        src_h, src_w = img.shape[:2]
        packed = np.asarray(self.batcher.submit(
            {"pages": padded[None],
             "rhw": np.array([[rh, rw]], np.int32)})[0])
        return db_device.unpack_boxes(packed, rw, rh, src_w, src_h)


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
