"""Micro-batcher: cross-thread coalescing, ordering, shape grouping."""
import threading
import time

import numpy as np

from onnxocr_tpu.runtime.batcher import MicroBatcher


def test_results_match_inputs():
    calls = []

    def fn(batch):
        calls.append(batch.shape[0])
        return batch * 2.0, batch.sum(axis=tuple(range(1, batch.ndim)))

    mb = MicroBatcher(fn, max_batch=16, max_wait_ms=10)
    try:
        outs = []
        threads = []

        def worker(i):
            item = np.full((2, 4), float(i), np.float32)
            doubled, sums = mb.submit(item)
            outs.append((i, doubled, sums))

        for i in range(6):
            t = threading.Thread(target=worker, args=(i,))
            t.start()
            threads.append(t)
        for t in threads:
            t.join()
        assert len(outs) == 6
        for i, doubled, sums in outs:
            np.testing.assert_allclose(doubled, np.full((2, 4), 2.0 * i))
            np.testing.assert_allclose(sums, np.full(2, 4.0 * i))
        # at least some coalescing happened (fewer calls than submissions)
        assert len(calls) <= 6
    finally:
        mb.close()


def test_shape_groups_run_separately():
    shapes_seen = []

    def fn(batch):
        shapes_seen.append(batch.shape[1:])
        return batch

    mb = MicroBatcher(fn, max_batch=8, max_wait_ms=20)
    try:
        results = {}

        def worker(key, shape):
            results[key] = mb.submit(np.ones(shape, np.float32))

        t1 = threading.Thread(target=worker, args=("a", (1, 3)))
        t2 = threading.Thread(target=worker, args=("b", (1, 5)))
        t1.start()
        t2.start()
        t1.join()
        t2.join()
        assert results["a"].shape == (1, 3)
        assert results["b"].shape == (1, 5)
        assert (3,) in shapes_seen and (5,) in shapes_seen
    finally:
        mb.close()


def test_error_propagates():
    def fn(batch):
        raise ValueError("boom")

    mb = MicroBatcher(fn, max_batch=4, max_wait_ms=1)
    try:
        try:
            mb.submit(np.ones((1, 2), np.float32))
            assert False, "should raise"
        except ValueError:
            pass
    finally:
        mb.close()


def test_batch_padding_is_invisible():
    seen = []

    def fn(batch):
        seen.append(batch.shape[0])
        return batch + 1

    mb = MicroBatcher(fn, max_batch=8, max_wait_ms=1,
                      batch_ladder=(4, 8))
    try:
        out = mb.submit(np.zeros((3, 2), np.float32))
        assert out.shape == (3, 2)
        assert seen[0] == 4  # padded up the ladder
    finally:
        mb.close()


def test_det_page_batcher_parity(test_image):
    """Concurrent pages through DetPageBatcher produce the same boxes as
    the host-resize reference path (small conv-numerics tolerance: the
    batched program may pick different XLA conv algorithms)."""
    import concurrent.futures
    from onnxocr_tpu import ONNXPaddleOcr

    host = ONNXPaddleOcr(use_angle_cls=False, tpu_det_input="host")
    batched = ONNXPaddleOcr(use_angle_cls=False, tpu_det_microbatch=True)
    ref = np.asarray(host.ocr(test_image, rec=False)[0], np.float32)
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        outs = list(pool.map(lambda im: batched.ocr(im, rec=False)[0],
                             [test_image] * 4))
    for b in outs:
        b = np.asarray(b, np.float32)
        assert b.shape == ref.shape
        assert np.abs(b - ref).max() <= 3.0
