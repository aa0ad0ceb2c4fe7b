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


def _render_strong_page(seed: int = 41, size: int = 640) -> np.ndarray:
    """High-contrast synthetic page whose det box scores sit far from
    box_thresh: parity tests must not hinge on marginal boxes that flip
    on ~1e-3 canvas-numerics differences (real scans like 1.jpg carry
    hundreds of ~0.3-score speckle candidates and a lone ~0.6 box)."""
    from onnxocr_tpu import config as cfg_mod
    from onnxocr_tpu.train import synth

    c2i = synth.charset_from_dict(
        cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt"))
    r = synth.TextRenderer(char_to_idx=c2i, seed=seed)
    page = np.full((size, size, 3), 240, np.uint8)
    y = 50
    for n in (6, 9, 7):
        line = r.render_line(r.random_text(n), 38, size - 60)
        lh, lw = line.shape[:2]
        page[y:y + lh, 30:30 + lw] = line
        y += lh + 120
    return page


def test_det_page_batcher_parity():
    """Concurrent pages through DetPageBatcher produce the same boxes as
    the host-resize reference path (small conv-numerics tolerance: the
    batched program may pick different XLA conv algorithms)."""
    import concurrent.futures
    from onnxocr_tpu import ONNXPaddleOcr

    page = _render_strong_page()
    host = ONNXPaddleOcr(use_angle_cls=False, tpu_det_input="host")
    batched = ONNXPaddleOcr(use_angle_cls=False, tpu_det_microbatch=True)
    ref = np.asarray(host.ocr(page, rec=False)[0], np.float32)
    assert ref.shape[0] >= 3  # the page must actually detect
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        outs = list(pool.map(lambda im: batched.ocr(im, rec=False)[0],
                             [page] * 4))
    for b in outs:
        b = np.asarray(b, np.float32)
        assert b.shape == ref.shape
        assert np.abs(b - ref).max() <= 3.0


def test_warp_crops_multi_matches_single():
    """warp_crops_multi on a stacked pair == warp_crops per image."""
    import jax.numpy as jnp
    from onnxocr_tpu.ops import warp as warp_ops

    rng = np.random.default_rng(0)
    img_a = rng.integers(0, 256, (64, 96, 3), np.uint8)
    img_b = rng.integers(0, 256, (64, 96, 3), np.uint8)
    box_a = np.array([[5, 5], [60, 8], [58, 28], [3, 25]], np.float32)
    box_b = np.array([[10, 30], [80, 30], [80, 50], [10, 50]], np.float32)
    mat_a, vw_a = warp_ops.build_crop_matrix(box_a, 48, 320)
    mat_b, vw_b = warp_ops.build_crop_matrix(box_b, 48, 320)

    single_a = np.asarray(warp_ops.warp_crops(
        jnp.asarray(img_a), jnp.asarray(mat_a[None]),
        jnp.asarray(np.array([vw_a], np.int32)), 48, 320))
    single_b = np.asarray(warp_ops.warp_crops(
        jnp.asarray(img_b), jnp.asarray(mat_b[None]),
        jnp.asarray(np.array([vw_b], np.int32)), 48, 320))

    multi = np.asarray(warp_ops.warp_crops_multi(
        jnp.stack([jnp.asarray(img_a), jnp.asarray(img_b)]),
        jnp.asarray(np.array([0, 1, 0], np.int32)),
        jnp.asarray(np.stack([mat_a, mat_b, mat_b])),
        jnp.asarray(np.array([vw_a, vw_b, vw_b], np.int32)), 48, 320))

    np.testing.assert_allclose(multi[0], single_a[0], atol=1e-5)
    np.testing.assert_allclose(multi[1], single_b[0], atol=1e-5)
    # crop 2 warps image A with B's matrix — must differ from crop 1
    assert np.abs(multi[2] - multi[1]).max() > 0.01


def test_rec_crop_batcher_parity(test_image):
    """Concurrent pages through the cross-request rec batcher produce the
    same texts/scores as the unbatched fused path."""
    import concurrent.futures
    from onnxocr_tpu import ONNXPaddleOcr

    # the multi-source batcher keeps the gather warp (warp_crops_multi
    # has no staged path), so the parity reference pins the same warp
    # config instead of the shear default
    plain = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                          tpu_warp_stage="off")
    batched = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                            tpu_rec_microbatch=True)
    small = test_image[:256, :256]
    images = [test_image, small, test_image, small]
    refs = [plain.ocr(im)[0] for im in (test_image, small)]
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        outs = list(pool.map(lambda im: batched.ocr(im)[0], images))
    for im, out in zip(images, outs):
        ref = refs[0] if im.shape == test_image.shape else refs[1]
        assert [l[1][0] for l in out] == [l[1][0] for l in ref]
        got_scores = np.array([l[1][1] for l in out])
        ref_scores = np.array([l[1][1] for l in ref])
        np.testing.assert_allclose(got_scores, ref_scores, atol=1e-3)


def test_group_collapsed():
    """Width-masking forwards route all non-extreme crops to ONE bucket
    (page max); extreme-wide crops keep per-bucket routing."""
    from onnxocr_tpu.pipeline import batching

    ladder = (320, 480, 640, 800, 960, 1280)
    groups = batching.group_collapsed([100, 400, 620, 300], ladder)
    assert groups == {640: [0, 1, 2, 3]}
    groups = batching.group_collapsed([100, 2000, 500], ladder)
    assert groups[640] == [0, 2]
    wide = [b for b, idx in groups.items() if idx == [1]]
    assert wide and wide[0] >= 1280
    assert batching.group_collapsed([], ladder) == {}


def test_rec_crop_batcher_promotion_parity():
    """Two same-source-bucket pages whose crop chunks land in DIFFERENT
    width buckets coalesce into one promoted group (run at the max bucket)
    and must still match the serial fused path exactly."""
    import concurrent.futures
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu import config as cfg_mod
    from onnxocr_tpu.train import synth

    c2i = synth.charset_from_dict(
        cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt"))
    r = synth.TextRenderer(char_to_idx=c2i, seed=31)
    pages = []
    for widths in ((3, 4), (16, 14)):  # short-line page vs long-line page
        page = np.full((640, 640, 3), 235, np.uint8)
        y = 60
        for n in widths:
            line = r.render_line(r.random_text(n), 36, 600)
            lh, lw = line.shape[:2]
            page[y:y + lh, 20:20 + lw] = line
            y += lh + 70
        pages.append(page)

    plain = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0)
    batched = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                            tpu_rec_microbatch=True,
                            tpu_microbatch_wait_ms=50.0)
    refs = [plain.ocr(p)[0] for p in pages]
    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        outs = list(pool.map(lambda p: batched.ocr(p)[0], pages))
    for ref, out in zip(refs, outs):
        assert [l[1][0] for l in out] == [l[1][0] for l in ref]
        np.testing.assert_allclose(
            np.array([l[1][1] for l in out]),
            np.array([l[1][1] for l in ref]), atol=1e-3)


def test_det_bits_batcher_e2e_parity(test_image):
    """Full det+cls+rec through the bits-wire page batcher (concurrent)
    matches the unbatched bitmap-wire pipeline."""
    import concurrent.futures
    from onnxocr_tpu import ONNXPaddleOcr

    plain = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0)
    batched = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                            tpu_det_microbatch=True)
    assert batched.text_detector._page_batcher.wire == "bits"
    ref = plain.ocr(test_image)[0]
    with concurrent.futures.ThreadPoolExecutor(3) as pool:
        outs = list(pool.map(lambda im: batched.ocr(im)[0],
                             [test_image] * 3))
    for out in outs:
        assert [l[1][0] for l in out] == [l[1][0] for l in ref]
        np.testing.assert_allclose(
            np.array([l[1][1] for l in out]),
            np.array([l[1][1] for l in ref]), atol=2e-3)


def test_det_bits_batcher_device_input_parity():
    """submit_bits_dev (det canvas resized ON DEVICE from the HBM source,
    no second per-page upload) must match the host-resize batched path
    (tpu_det_batch_input='host')."""
    from onnxocr_tpu import ONNXPaddleOcr

    page = _render_strong_page(seed=43)
    host_m = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                           tpu_det_microbatch=True,
                           tpu_det_batch_input="host")
    dev_m = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                          tpu_det_microbatch=True,
                          tpu_det_batch_input="device")
    ref = host_m.ocr(page)[0]
    assert len(ref) >= 3
    out = dev_m.ocr(page)[0]
    assert host_m.text_detector._page_batcher.dev_submits == 0
    assert dev_m.text_detector._page_batcher.dev_submits >= 1
    assert [l[1][0] for l in out] == [l[1][0] for l in ref]
    rb = np.array([l[0] for l in ref], np.float64)
    gb = np.array([l[0] for l in out], np.float64)
    assert rb.shape == gb.shape and np.abs(rb - gb).max() <= 1.0


def test_scored_rec_batcher_parity():
    """Bitmap wire + rec microbatch: concurrent pages' scored cls+rec
    calls coalesce (fused.call_multi_scored) and must match the serial
    bitmap-wire pipeline (scores decide which boxes survive, so text
    lists AND box sets must agree)."""
    import concurrent.futures
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu import config as cfg_mod
    from onnxocr_tpu.train import synth

    c2i = synth.charset_from_dict(
        cfg_mod.find_asset("ppocrv5/ppocrv5_dict.txt"))
    r = synth.TextRenderer(char_to_idx=c2i, seed=77)
    pages = []
    for seed_off in range(2):
        page = np.full((640, 640, 3), 235, np.uint8)
        y = 60
        for n in (5, 9):
            line = r.render_line(r.random_text(n), 36, 580)
            lh, lw = line.shape[:2]
            page[y:y + lh, 25:25 + lw] = line
            y += lh + 150
        pages.append(page)

    plain = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0)
    batched = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                            tpu_rec_microbatch=True,
                            tpu_microbatch_wait_ms=50.0)
    refs = [plain.ocr(p)[0] for p in pages]
    with concurrent.futures.ThreadPoolExecutor(2) as pool:
        outs = list(pool.map(lambda p: batched.ocr(p)[0], pages))
    for ref, out in zip(refs, outs):
        assert [l[1][0] for l in out] == [l[1][0] for l in ref]
        rb = np.array([l[0] for l in ref], np.float64)
        gb = np.array([l[0] for l in out], np.float64)
        assert rb.shape == gb.shape and np.abs(rb - gb).max() <= 1.0


def test_tiny_image_with_det_microbatch():
    """Regression (ADVICE r2 high): tiny pages (h+w<64) fall through to the
    page batcher's maps-wire handling in TextSystem; in the default bits
    wire this crashed with a ValueError because submit() returned a
    (bits, probs) tuple. Tiny pages must OCR cleanly (usually 0 boxes)."""
    from onnxocr_tpu import ONNXPaddleOcr

    m = ONNXPaddleOcr(use_angle_cls=True, tpu_det_microbatch=True)
    assert m.text_detector._page_batcher.wire == "bits"
    tiny = np.zeros((20, 20, 3), np.uint8)
    res = m.ocr(tiny)
    assert isinstance(res, list) and len(res) == 1
    assert res[0] == [] or isinstance(res[0], list)


def test_rec_batcher_canonical_shapes():
    """Deterministic cross-request shapes: a coalesced (multi-page) group
    must run at the canonical program shape — fixed max crop batch, run
    width drawn from COALESCE_WIDTHS — never at a wave-composition-
    dependent shape (the round-2 blocker for enabling the batcher in the
    serving config)."""
    import jax.numpy as jnp
    from onnxocr_tpu import ONNXPaddleOcr
    from onnxocr_tpu.runtime.batcher import RecCropBatcher

    m = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                      tpu_rec_microbatch=True,
                      tpu_microbatch_wait_ms=5000.0)
    rec = m.text_recognizer
    if not rec.forward.masks_width:
        return  # promotion (and thus coalescing) needs a masking forward
    fused = m._fused
    calls = []
    orig = fused.call_multi_scored

    def spy(images, probs, rhw, img_idx, quads, *rest, **kw):
        calls.append((int(images.shape[0]), int(quads.shape[0]), rest[-1]))
        return orig(images, probs, rhw, img_idx, quads, *rest, **kw)

    fused.call_multi_scored = spy
    page = jnp.asarray(np.full((256, 256, 3), 230, np.uint8))
    prob = jnp.zeros((320, 320), np.float32)
    boxes = np.array([[[10, 10], [120, 10], [120, 40], [10, 40]],
                      [[10, 60], [200, 60], [200, 100], [10, 100]]],
                     np.float32)
    outs = []

    def worker():
        outs.append(rec.run_candidates_scored(
            page, prob, 320, 320, boxes, boxes.copy(), fused,
            (48, 192), use_cls=True))

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(outs) == 2
    multi = [c for c in calls if c[0] >= 2]
    assert multi, "two simultaneous pages should coalesce"
    for b_img, bsz, out_w in multi:
        assert bsz == rec.batch_ladder[-1]
        assert out_w in RecCropBatcher.COALESCE_WIDTHS


def test_rec_batcher_warm_canonical():
    """warm_canonical compiles the full coalesced-program set for one
    source bucket without error and reports what it warmed."""
    from onnxocr_tpu import ONNXPaddleOcr

    m = ONNXPaddleOcr(use_angle_cls=True, tpu_rec_microbatch=True)
    rb = m.text_recognizer._crop_batcher
    # shrink the canonical set for CPU test cost; the enumeration logic is
    # identical at the default (640, 960) x (2, 4) x 64 shapes
    rb.COALESCE_WIDTHS = (320,)
    rb.img_ladder = (1, 2)
    rb.batch_ladder = (1, 2, 4, 8)
    warmed = rb.warm_canonical(m._fused, (256, 256, 3), 48,
                               use_cls=True, prob_shape=(320, 320))
    assert warmed == ["i2_w320"]
    stopped = rb.warm_canonical(m._fused, (256, 256, 3), 48,
                                use_cls=True, prob_shape=(320, 320),
                                should_stop=lambda: True)
    assert stopped == []


def test_rec_batcher_warmed_only_gate():
    """Once warm_canonical has registered any canonical program, multi-page
    groups run ONLY at registered keys: two pages of an UNWARMED source
    bucket fall back to solo per-page runs (never a mid-traffic compile),
    while the warmed bucket still coalesces."""
    import jax.numpy as jnp
    from onnxocr_tpu import ONNXPaddleOcr

    m = ONNXPaddleOcr(use_angle_cls=True, drop_score=0.0,
                      tpu_rec_microbatch=True,
                      tpu_microbatch_wait_ms=5000.0)
    rec = m.text_recognizer
    if not rec.forward.masks_width:
        return
    fused = m._fused
    rb = rec._crop_batcher
    # shrink for CPU test cost; enumeration logic identical at defaults
    rb.img_ladder = (1, 2)
    rb.batch_ladder = (1, 2, 4, 8)

    warmed = rb.warm_canonical(fused, (256, 256, 3), 48, use_cls=True,
                               prob_shape=(320, 320))
    assert warmed and rb._warmed

    calls = []
    orig = fused.call_multi_scored

    def spy(images, probs, rhw, img_idx, quads, *rest, **kw):
        calls.append(int(images.shape[0]))
        return orig(images, probs, rhw, img_idx, quads, *rest, **kw)

    fused.call_multi_scored = spy
    boxes = np.array([[[10, 10], [120, 10], [120, 40], [10, 40]],
                      [[10, 60], [200, 60], [200, 100], [10, 100]]],
                     np.float32)

    def run_pages(page_shape, prob_shape):
        page = jnp.asarray(np.full(page_shape, 230, np.uint8))
        prob = jnp.zeros(prob_shape, np.float32)
        outs = []

        def worker():
            outs.append(rec.run_candidates_scored(
                page, prob, prob_shape[0], prob_shape[1], boxes,
                boxes.copy(), fused, (48, 192), use_cls=True))

        threads = [threading.Thread(target=worker) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return outs

    # unwarmed source bucket: must NOT coalesce (solo b_img=1 runs only)
    calls.clear()
    outs = run_pages((512, 512, 3), (640, 640))
    assert len(outs) == 2 and all(len(o[0]) == 2 for o in outs)
    assert calls and all(b == 1 for b in calls), calls

    # the warmed bucket still coalesces
    calls.clear()
    outs = run_pages((256, 256, 3), (320, 320))
    assert len(outs) == 2 and all(len(o[0]) == 2 for o in outs)
    assert any(b >= 2 for b in calls), calls
