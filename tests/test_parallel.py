"""Mesh sharding tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""
import numpy as np
import jax
import pytest

from onnxocr_tpu.parallel import mesh as mesh_lib


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return mesh_lib.make_mesh(8, model_parallel=2)


def test_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 4, "model": 2}


def test_sharded_rec_params_placement(mesh8):
    from onnxocr_tpu.models import svtr
    params = svtr.init(0, vocab_size=64)
    placed = mesh_lib.shard_rec_params(params, mesh8)
    head_w = placed["head"]["w"]
    # vocab axis sharded over `model`
    assert head_w.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    # everything else replicated
    stem = placed["stem"]["conv"]["w"]
    assert stem.sharding.spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_runs(mesh8):
    import optax
    from onnxocr_tpu.train import rec_trainer
    params, optimizer, _ = rec_trainer.init_training(0, 64, lr=1e-3)
    params = mesh_lib.shard_rec_params(params, mesh8)
    opt_state = optimizer.init(params)
    B = 8
    batch = mesh_lib.shard_batch(
        {"images": np.zeros((B, 48, 64, 3), np.float32),
         "labels": np.ones((B, 8), np.int32),
         "pads": np.zeros((B, 8), np.float32)}, mesh8)
    step = rec_trainer.make_sharded_train_step(mesh8, optimizer)
    params2, opt_state2, loss = step(params, opt_state, batch["images"],
                                     batch["labels"], batch["pads"])
    assert np.isfinite(float(loss))
    # params keep their shardings through the update
    assert params2["head"]["w"].sharding.spec == \
        jax.sharding.PartitionSpec(None, "model")


def test_sharded_det_batch(mesh8):
    from onnxocr_tpu.parallel.serving import ShardedDetBatch
    from onnxocr_tpu.models import dbnet
    params = dbnet.init(0)
    det = ShardedDetBatch(params, mesh8)
    batch = np.zeros((5, 64, 64, 3), np.uint8)  # 5 pads to 8 internally
    out = det(batch)
    assert out.shape == (5, 64, 64)


def test_sharded_rec_batch(mesh8):
    from onnxocr_tpu.parallel.serving import ShardedRecBatch
    from onnxocr_tpu.models import svtr
    params = svtr.init(0, vocab_size=64)
    rec = ShardedRecBatch(params, mesh8)
    idx, prob = rec(np.zeros((6, 48, 64, 3), np.float32))
    assert idx.shape == (6, 8) and prob.shape == (6, 8)


def test_det_page_batcher_on_mesh():
    """The serving det page batcher shards its page batch over the mesh's
    data axis (engine wiring: EngineManager._maybe_shard_det)."""
    import concurrent.futures
    from onnxocr_tpu.pipeline import backends
    from onnxocr_tpu.runtime.batcher import DetPageBatcher
    from onnxocr_tpu.models import dbnet

    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    fwd = backends.DetForward("native", params=dbnet.init(0),
                              map_dtype="uint8")
    pb = DetPageBatcher(fwd, limit_side_len=64, max_wait_ms=20.0,
                        batch_ladder=(1, 2, 4, 8), mesh=mesh)
    # ladder is padded to data-axis multiples
    assert all(b % 8 == 0 for b in pb.batcher.batch_ladder)
    img = np.full((50, 70, 3), 255, np.uint8)
    with concurrent.futures.ThreadPoolExecutor(4) as pool:
        outs = list(pool.map(pb.submit, [img] * 4))
    ref_prob, ref_shape = outs[0]
    for prob, shape_info in outs:
        assert prob.shape == ref_prob.shape
        np.testing.assert_allclose(prob, ref_prob)
        np.testing.assert_allclose(shape_info, ref_shape)


def test_sharded_onecall_batch():
    """The DEFAULT (onecall) pipeline shards a page batch over the mesh's
    data axis and its per-page packed buffers decode like the single-page
    program's (VERDICT r3 #5)."""
    import warnings
    from onnxocr_tpu import ONNXPaddleOcr

    mesh = mesh_lib.make_mesh(8, model_parallel=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        model = ONNXPaddleOcr(
            use_angle_cls=True, use_gpu=False, tpu_pipeline="onecall",
            det_limit_side_len=64, tpu_det_bucket=64,
            tpu_onecall_rec_width=96, tpu_onecall_max_boxes=8,
            tpu_onecall_det_candidates=32, tpu_allow_untrained=True)
    oc = model._onecall
    assert oc is not None
    fn = oc.sharded_batch_fn(True, mesh, out_h=64, out_w=64)
    B = 8
    pages = np.full((B, 64, 64, 3), 255, np.uint8)
    pages[:, 20:34, 8:56] = 0
    dims = np.full((B,), 64, np.int32)
    cls_p = oc.fused.cls_forward.pdev if oc.fused.cls_forward else {}
    packed = np.asarray(fn(oc.detector.forward.pdev, cls_p,
                           oc.fused.rec_forward.pdev,
                           pages, dims, dims, dims, dims))
    assert packed.shape[0] == B
    # identical pages → identical per-page buffers, and the single-page
    # program agrees with every row of the batch
    for i in range(1, B):
        np.testing.assert_allclose(packed[i], packed[0])
    single = oc._build(True)
    import jax.numpy as jnp
    one = np.asarray(single(oc.detector.forward.pdev, cls_p,
                            oc.fused.rec_forward.pdev,
                            jnp.asarray(pages[0]), jnp.int32(64),
                            jnp.int32(64), jnp.int32(64), jnp.int32(64),
                            out_h=64, out_w=64))
    # 2e-3: the single-page program warps eligible crops through the
    # shear-staged fast path while the vmapped/sharded program keeps the
    # gather warp (vmap turns its lax.cond into a both-legs select, so
    # batched builders disable staging) — rec probs differ at the
    # sub-pixel-resample level, texts and geometry are identical
    np.testing.assert_allclose(one, packed[0], rtol=2e-3, atol=2e-3)
