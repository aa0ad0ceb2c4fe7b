"""Committed eval-gate ledger (VERDICT r4 #5).

Round-4's adoption claims lost their evidence when scratch/ vanished on a
host swap. Every checkpoint adoption/rejection now appends ONE JSON line
to the committed `evalgates.jsonl` at the repo root: checkpoint sha256,
eval summary (combined + per-set subtotals from tools/eval_heldout.py),
the decision, and enough context to re-run the gate.

Two modes:

  run  — invoke tools/eval_heldout.py with the given overrides, parse its
         summary, and append the line:
           python tools/evalgate.py run --name r5_photo \
               --rec-dir scratch/gate_photo/rec.onnx --decision pending
  log  — ingest an eval JSON that was already produced (e.g. a gate that
         ran overnight):
           python tools/evalgate.py log --name r5_photo \
               --from-json scratch/evalgate_r5_photo_cand.json \
               --rec-dir scratch/gate_photo/rec.onnx --decision adopt \
               --notes "beats head 0.683 real char acc"

The ledger is append-only; a later line with the same name supersedes the
earlier decision (e.g. pending → adopt).
"""
import argparse
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER = os.path.join(REPO, "evalgates.jsonl")


def sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def ckpt_hashes(args) -> dict:
    out = {}
    for kind, model_dir in (("det", args.det_dir), ("rec", args.rec_dir)):
        if not model_dir:
            continue
        npz = os.path.join(os.path.dirname(model_dir), "native_params.npz")
        if os.path.exists(npz):
            out[kind] = {"path": os.path.relpath(npz, REPO),
                         "sha256": sha256_file(npz)[:16]}
    return out


def git_head() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
            text=True).strip()
    except Exception:
        return "unknown"


def append(entry: dict):
    with open(LEDGER, "a") as f:
        f.write(json.dumps(entry, ensure_ascii=False) + "\n")
    print(json.dumps(entry, ensure_ascii=False))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["run", "log"])
    ap.add_argument("--name", required=True,
                    help="gate label, e.g. r5_photo_rec")
    ap.add_argument("--det-dir", default="")
    ap.add_argument("--rec-dir", default="")
    ap.add_argument("--model", default="PP-OCRv5")
    ap.add_argument("--set", action="append", default=[],
                    help="extra kwarg override passed to eval_heldout")
    ap.add_argument("--from-json", default="",
                    help="log mode: eval_heldout --json output file")
    ap.add_argument("--decision", default="pending",
                    choices=["pending", "adopt", "reject"])
    ap.add_argument("--notes", default="")
    args = ap.parse_args()

    if args.mode == "run":
        cmd = [sys.executable, os.path.join(REPO, "tools",
                                            "eval_heldout.py"), "--json",
               "--model", args.model]
        if args.det_dir:
            cmd += ["--det-dir", args.det_dir]
        if args.rec_dir:
            cmd += ["--rec-dir", args.rec_dir]
        for s in args.set:
            cmd += ["--set", s]
        out = subprocess.check_output(cmd, cwd=REPO, text=True)
        payload = json.loads(out.strip().splitlines()[-1])
    else:
        with open(args.from_json) as f:
            payload = json.loads(f.read().strip().splitlines()[-1])

    summary = payload.get("summary", payload)
    append({
        "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "name": args.name,
        "git_head": git_head(),
        "model": args.model,
        "overrides": {k: v for k, v in
                      (("det_dir", args.det_dir),
                       ("rec_dir", args.rec_dir),
                       ("set", args.set)) if v},
        "checkpoints": ckpt_hashes(args),
        "summary": {k: summary.get(k) for k in
                    ("gt_lines", "line_recall@0.5", "char_accuracy",
                     "exact_match", "subtotals")},
        "decision": args.decision,
        "notes": args.notes,
    })


if __name__ == "__main__":
    main()
