"""Train the native det/rec models on synthetic rendered text and save
checkpoints into onnxocr_tpu/assets/ so the pipeline runs with real
(functional) weights despite the reference snapshot's missing .onnx blobs.

Usage:
  python tools/train_synthetic.py rec --steps 3000 --batch 64
  python tools/train_synthetic.py det --steps 1500 --batch 8
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax


def asset_dir(*parts):
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "onnxocr_tpu", "assets")
    return os.path.join(root, *parts)


def train_rec(steps: int, batch: int, width: int, lr: float, out: str,
              arch: str = "svtr", dict_rel: str = "ppocrv5/ppocrv5_dict.txt",
              use_space: bool = True, init_from: str = "",
              widths: tuple = (), charset: str = "full", seed: int = 0,
              max_len: int = 14, structured_frac: float = 0.0,
              lowres_frac: float = 0.0, photo_frac: float = 0.0,
              dotmatrix_frac: float = 0.0, rec_dim: int = 0,
              rec_depth: int = 0, rec_width_mult: float = 1.0,
              replay: int = 1):
    from onnxocr_tpu import config as cfg
    from onnxocr_tpu.train import synth, rec_trainer
    from onnxocr_tpu.models import svtr, crnn
    from onnxocr_tpu.ops.ctc import CTCLabelDecode
    from onnxocr_tpu.utils import params_io

    model_mod = crnn if arch == "crnn" else svtr
    dict_path = cfg.find_asset(dict_rel)
    dec = CTCLabelDecode(dict_path, use_space_char=use_space)
    vocab = len(dec.character)
    c2i = synth.charset_from_dict(
        dict_path,
        charset=None if charset == "full" else synth.DEFAULT_CHARSET)
    renderer = synth.TextRenderer(char_to_idx=c2i, seed=seed,
                                  structured_frac=structured_frac,
                                  lowres_frac=lowres_frac,
                                  photo_frac=photo_frac,
                                  dotmatrix_frac=dotmatrix_frac)
    renderer2 = synth.TextRenderer(char_to_idx=c2i, seed=seed + 1000,
                                   structured_frac=structured_frac,
                                   lowres_frac=lowres_frac,
                                   photo_frac=photo_frac,
                                   dotmatrix_frac=dotmatrix_frac)
    print(f"arch={arch} vocab={vocab} dict-mapped={len(c2i)} "
          f"renderable={len(renderer.charset)}")

    rng = jax.random.PRNGKey(seed)
    init_kw = {}
    if model_mod is svtr:
        if rec_dim:
            init_kw["dim"] = rec_dim
        if rec_depth:
            init_kw["depth"] = rec_depth
        if rec_width_mult != 1.0:
            init_kw["width_mult"] = rec_width_mult
    params = model_mod.init(rng, vocab, **init_kw)
    if init_from and os.path.exists(init_from):
        from onnxocr_tpu.utils import params_io as _pio
        params = _pio.load_tree(init_from)
        print(f"fine-tuning from {init_from}")
    warmup = min(100, max(1, steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(steps, warmup + 1), lr * 0.05)
    optimizer = optax.adamw(schedule, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    step_fn = rec_trainer.make_train_step(optimizer, model_mod=model_mod)

    # fixed label length so one compiled program serves all steps;
    # optional width mixing cycles through a small ladder (one compiled
    # program per width). Batches are produced by a background thread so
    # host-side PIL rendering overlaps the device step (the renderer is
    # only touched from that thread — np.default_rng isn't thread-safe).
    width_cycle = list(widths) or [width]

    # SVTR trains with the attention width mask on (valid_t from the true
    # rendered widths) so training matches the inference-time
    # bucket-invariant forward; CRNN has no mask.
    mask_widths = model_mod is svtr

    def gen_batch(r, step):
        w_cur = width_cycle[step % len(width_cycle)]
        imgs, labels, pads, ws = r.rec_batch(batch, w_cur, max_len,
                                             return_widths=True)
        if labels.shape[1] < max_len:
            pad_n = max_len - labels.shape[1]
            labels = np.pad(labels, ((0, 0), (0, pad_n)))
            pads = np.pad(pads, ((0, 0), (0, pad_n)), constant_values=1.0)
        vt = ((ws + 7) // 8).astype(np.int32) if mask_widths else None
        return imgs, labels[:, :max_len], pads[:, :max_len], vt

    import queue
    import threading
    # two producers (own renderer each — the np rng is not thread-safe),
    # striped by step parity so every width in the cycle keeps appearing
    queues = [queue.Queue(maxsize=3), queue.Queue(maxsize=3)]

    # --replay k: feed each freshly-rendered batch k times. Training here
    # is RENDER-bound (one host core; the device step is a fraction of the
    # render time), so replay multiplies effective steps/sec by ~k at a
    # mild sample-diversity cost (fresh data still arrives every k steps).
    def producer(r, qi):
        b = None
        for s in range(qi, steps, 2):
            if b is None or (s // 2) % max(replay, 1) == 0:
                b = gen_batch(r, s)
            queues[qi].put(b)

    threading.Thread(target=producer, args=(renderer, 0), daemon=True).start()
    threading.Thread(target=producer, args=(renderer2, 1),
                     daemon=True).start()

    t0 = time.time()
    for step in range(steps):
        imgs, labels, pads, vt = queues[step % 2].get()
        params, opt_state, loss = step_fn(params, opt_state, imgs, labels,
                                          pads, vt)
        if step % 50 == 0 or step == steps - 1:
            print(f"rec step {step} loss {float(loss):.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)
        if step and step % 150 == 0:
            # frequent periodic checkpoints: host RSS grows slowly but
            # steadily on the tunneled backend (deferred frees in the
            # remote client), so long jobs can die by OOM — losing at most
            # 150 steps keeps every run salvageable
            params_io.save_tree(out, params)
            import gc
            gc.collect()
    params_io.save_tree(out, params)
    print("saved", out)

    # quick eval: greedy-decode a fresh batch
    from onnxocr_tpu.ops import ctc as ctc_ops
    imgs, labels, pads, ws = renderer.rec_batch(8, width, max_len,
                                                return_widths=True)
    if mask_widths:
        logits = jax.jit(model_mod.apply)(
            params, imgs, ((ws + 7) // 8).astype(np.int32))
    else:
        logits = jax.jit(model_mod.apply)(params, imgs)
    idx, prob = ctc_ops.ctc_reduce_logits(logits.astype(jnp.float32))
    res = dec.decode_indices(np.asarray(idx), np.asarray(prob),
                             is_remove_duplicate=True)
    for i, (text, score) in enumerate(res):
        truth = "".join(dec.character[j] for j, p in
                        zip(labels[i], pads[i]) if p == 0.0)
        print(f"  pred={text!r} truth={truth!r} score={score:.2f}")


def _graft_matching(dst, src):
    """Copy leaves from src into dst wherever the tree paths exist in both
    and the shapes match (warm-starting a different backbone keeps the FPN
    smooth convs + head). Returns (tree, n_copied)."""
    copied = 0

    def rec(d, s):
        nonlocal copied
        if isinstance(d, dict) and isinstance(s, dict):
            return {k: rec(v, s[k]) if k in s else v for k, v in d.items()}
        if isinstance(d, list) and isinstance(s, list):
            return [rec(dv, sv) for dv, sv in zip(d, s)] + d[len(s):]
        if hasattr(d, "shape") and hasattr(s, "shape") and d.shape == s.shape:
            copied += 1
            return np.asarray(s, dtype=d.dtype)
        return d

    return rec(dst, src), copied


def train_det(steps: int, batch: int, size: int, lr: float, out: str,
              arch: str = "mbv3", seed: int = 0, init_from: str = "",
              hard_frac: float = 0.0, table_frac: float = 0.0,
              structured_frac: float = 0.0, replay: int = 1,
              distill_from: str = "", distill_w: float = 0.7):
    from onnxocr_tpu import config as cfg
    from onnxocr_tpu.train import synth, det_trainer
    from onnxocr_tpu.utils import params_io

    dict_path = cfg.find_asset("ppocrv5/ppocrv5_dict.txt")
    c2i = synth.charset_from_dict(dict_path, charset=None)
    renderer = synth.TextRenderer(char_to_idx=c2i, seed=seed + 1,
                                  structured_frac=structured_frac)
    renderer2 = synth.TextRenderer(char_to_idx=c2i, seed=seed + 1001,
                                   structured_frac=structured_frac)

    rng = jax.random.PRNGKey(seed)
    params, optimizer, opt_state = det_trainer.init_training(
        rng, lr, backbone_arch=arch)
    if init_from and os.path.exists(init_from):
        donor = params_io.load_tree(init_from)
        params, n = _graft_matching(params, donor)
        print(f"warm-started {n} matching tensors from {init_from}")
    warmup = min(100, max(1, steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, max(steps, warmup + 1), lr * 0.05)
    optimizer = optax.adamw(schedule, weight_decay=1e-5)
    opt_state = optimizer.init(params)
    teacher = None
    if distill_from:
        teacher = params_io.load_tree(distill_from)
        print(f"distilling from teacher {distill_from} (w={distill_w})")
        step_fn = det_trainer.make_distill_step(
            optimizer, teacher_arch="mbv3", w=distill_w,
            backbone_arch=arch)
    else:
        step_fn = det_trainer.make_train_step(optimizer, backbone_arch=arch)

    import queue
    import threading
    q = queue.Queue(maxsize=4)
    half = (batch + 1) // 2  # 2*half >= batch; consumer trims to batch

    # --replay: same render-bound rationale as the rec trainer
    def producer(r, n_items):
        b = None
        for i in range(n_items):
            if b is None or i % max(replay, 1) == 0:
                b = r.det_batch(half, size, hard_frac=hard_frac,
                                table_frac=table_frac)
            q.put(b)

    # two half-batch producers; the consumer stitches pairs
    threading.Thread(target=producer, args=(renderer, steps),
                     daemon=True).start()
    threading.Thread(target=producer, args=(renderer2, steps),
                     daemon=True).start()

    t0 = time.time()
    for step in range(steps):
        a = q.get()
        b = q.get()
        imgs, maps, masks = (np.concatenate([a[i], b[i]])[:batch]
                             for i in range(3))
        if teacher is not None:
            params, opt_state, loss = step_fn(params, teacher, opt_state,
                                              imgs, maps, masks)
        else:
            params, opt_state, loss = step_fn(params, opt_state, imgs,
                                              maps, masks)
        if step % 25 == 0 or step == steps - 1:
            print(f"det step {step} loss {float(loss):.4f} "
                  f"({time.time()-t0:.1f}s)", flush=True)
        if step and step % 150 == 0:
            params_io.save_tree(out, params)  # periodic checkpoint (see
            import gc                         # rec loop note on host RSS)
            gc.collect()
    params_io.save_tree(out, params)
    print("saved", out)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["rec", "det"])
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--arch", type=str, default="svtr",
                    choices=["svtr", "crnn"])
    ap.add_argument("--dict", type=str, dest="dict_rel",
                    default="ppocrv5/ppocrv5_dict.txt")
    ap.add_argument("--no-space", action="store_true")
    ap.add_argument("--det-arch", type=str, default="mbv3",
                    choices=["mbv3", "resnet18"])
    ap.add_argument("--init-from", type=str, default="")
    ap.add_argument("--widths", type=str, default="",
                    help="comma list for width-mixed training, e.g. 320,640")
    ap.add_argument("--charset", type=str, default="full",
                    choices=["full", "ascii"],
                    help="full = every dict char the fonts can render")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-len", type=int, default=14)
    ap.add_argument("--hard-frac", type=float, default=0.0,
                    help="fraction of det pages drawn from the photo-ish "
                         "hard renderer (textured bg, clutter, jitter)")
    ap.add_argument("--table-frac", type=float, default=0.0,
                    help="fraction of det pages drawn as ruled tables "
                         "with aligned numeric cells")
    ap.add_argument("--structured-frac", type=float, default=0.0,
                    help="probability a sampled line is words/numbers "
                         "structured text instead of uniform glyph soup")
    ap.add_argument("--lowres-frac", type=float, default=0.0,
                    help="probability a rec line gets the low-res "
                         "degradation (downscale to 8-22 px + optional "
                         "JPEG roundtrip + upscale — the tiny-text blur "
                         "real crops carry)")
    ap.add_argument("--photo-frac", type=float, default=0.0,
                    help="probability a rec line renders as scene-photo "
                         "text (textured background, alpha-composited "
                         "ink, photometric jitter)")
    ap.add_argument("--dotmatrix-frac", type=float, default=0.0,
                    help="probability a rec line renders as dot-matrix "
                         "print (boarding passes, receipt printers)")
    ap.add_argument("--rec-dim", type=int, default=0,
                    help="mixer dim for a from-scratch svtr (0 = default "
                         "192); heads derive as dim//32")
    ap.add_argument("--rec-depth", type=int, default=0,
                    help="mixer depth for a from-scratch svtr (0 = 2)")
    ap.add_argument("--rec-width-mult", type=float, default=1.0,
                    help="conv-backbone channel multiplier (from-scratch)")
    ap.add_argument("--replay", type=int, default=1,
                    help="feed each rendered batch N times (render-bound "
                         "host: ~N x steps/sec at slight diversity cost)")
    ap.add_argument("--distill-from", type=str, default="",
                    help="det only: mbv3 teacher checkpoint whose prob "
                         "maps the student trains against (soft-BCE blend)")
    ap.add_argument("--distill-w", type=float, default=0.7,
                    help="weight on the distillation term (det)")
    args = ap.parse_args()
    if args.which == "rec":
        out = args.out or asset_dir("ppocrv5", "rec", "native_params.npz")
        widths = tuple(int(w) for w in args.widths.split(",") if w)
        train_rec(args.steps, args.batch, args.width, args.lr, out,
                  arch=args.arch, dict_rel=args.dict_rel,
                  use_space=not args.no_space, init_from=args.init_from,
                  widths=widths, charset=args.charset, seed=args.seed,
                  max_len=args.max_len,
                  structured_frac=args.structured_frac,
                  lowres_frac=args.lowres_frac,
                  photo_frac=args.photo_frac,
                  dotmatrix_frac=args.dotmatrix_frac,
                  rec_dim=args.rec_dim, rec_depth=args.rec_depth,
                  rec_width_mult=args.rec_width_mult, replay=args.replay)
    else:
        out = args.out or asset_dir("ppocrv5", "det", "native_params.npz")
        train_det(args.steps, args.batch, args.size, args.lr, out,
                  arch=args.det_arch, seed=args.seed,
                  init_from=args.init_from, hard_frac=args.hard_frac,
                  table_frac=args.table_frac,
                  structured_frac=args.structured_frac,
                  replay=args.replay, distill_from=args.distill_from,
                  distill_w=args.distill_w)
