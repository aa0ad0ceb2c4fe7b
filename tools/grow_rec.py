"""Net2net depth growth for the SVTR recognizer (VERDICT r4 #3).

The round-4 scaled SVTR (dim 256 / depth 6, from scratch) never left the
CTC blank plateau. This grows the ADOPTED dim-192/depth-2 checkpoint
instead: new mixer blocks are appended with identity residuals (proj.w
and fc2.w zeroed), so the grown net computes EXACTLY the same function
as the donor at step 0 — training starts from the working solution with
extra capacity, not from the blank plateau.

    python tools/grow_rec.py --src onnxocr_tpu/assets/ppocrv5/rec/native_params.npz \
        --out scratch/ckpt_rec_grown.npz --add-depth 4

Then continue training with tools/train_synthetic.py rec --init-from.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--add-depth", type=int, default=4)
    ap.add_argument("--seed", type=int, default=5001)
    ap.add_argument("--init-scale", type=float, default=1.0,
                    help="scale on the random (non-zeroed) inits of the "
                         "new blocks")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from onnxocr_tpu.models import common as cm
    from onnxocr_tpu.utils import params_io

    tree = params_io.load_tree(args.src)
    blocks = tree["mixer"]
    dim = int(np.asarray(blocks[0]["ln1"]["scale"]).shape[0])
    mlp = int(np.asarray(blocks[0]["fc1"]["w"]).shape[1]) // dim
    print(f"donor: depth={len(blocks)} dim={dim} mlp_ratio={mlp}")

    keys = cm.split_rng(jax.random.PRNGKey(args.seed), 2 * args.add_depth)
    ki = iter(range(len(keys)))
    f32 = np.float32
    for _ in range(args.add_depth):
        qkv = cm.linear_init(keys[next(ki)], dim, 3 * dim)
        fc1 = cm.linear_init(keys[next(ki)], dim, mlp * dim)
        blk = {
            "ln1": {"scale": np.ones((dim,), f32),
                    "bias": np.zeros((dim,), f32)},
            "qkv": {"w": np.asarray(qkv["w"], f32) * args.init_scale,
                    "b": np.asarray(qkv["b"], f32)},
            # zero out-projections: both residual branches add exactly 0,
            # so the grown net == donor at step 0 (function-preserving)
            "proj": {"w": np.zeros((dim, dim), f32),
                     "b": np.zeros((dim,), f32)},
            "ln2": {"scale": np.ones((dim,), f32),
                    "bias": np.zeros((dim,), f32)},
            "fc1": {"w": np.asarray(fc1["w"], f32) * args.init_scale,
                    "b": np.asarray(fc1["b"], f32)},
            "fc2": {"w": np.zeros((mlp * dim, dim), f32),
                    "b": np.zeros((dim,), f32)},
        }
        blocks.append(blk)
    tree["mixer"] = blocks
    params_io.save_tree(args.out, tree)
    print(f"wrote {args.out}: depth={len(blocks)}")

    # sanity: grown forward == donor forward on a random input
    from onnxocr_tpu.models import svtr
    donor = params_io.load_tree(args.src)
    grown = params_io.load_tree(args.out)
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 48, 64, 3)).astype(np.float32))
    a = svtr.apply(donor, x)
    b = svtr.apply(grown, x)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"function preservation max|Δlogits| = {err:.3e}")
    assert err < 2e-2, "growth is not function-preserving"


if __name__ == "__main__":
    main()
