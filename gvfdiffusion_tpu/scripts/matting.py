"""Batch matting CLI — the reference's scripts/inference_MODNet.py:16-110
surface (input dir -> per-image matte PNGs) over the flax MODNet.

    python -m gvfdiffusion_tpu.scripts.matting \
        --input-path frames/ --output-path mattes/ [--ckpt-path modnet.npz]

Without --ckpt-path the model runs with randomly-initialized weights (only
useful for smoke-testing the plumbing; real mattes need trained weights
saved as an .npz of the flax param pytree, see load_params)."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..models.modnet import MODNet, make_matting_fn


def load_params(model: MODNet, path: str):
    """Load a flax param pytree from .npz (flat {'/'.join(path): array})."""
    import flax.traverse_util as tu

    flat = dict(np.load(path))
    tree = tu.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})
    return jax.tree.map(lambda a: a, tree)


def save_params(params, path: str):
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input-path", required=True)
    p.add_argument("--output-path", required=True)
    p.add_argument("--ckpt-path", default=None)
    p.add_argument("--ref-size", type=int, default=512)
    args = p.parse_args(argv)

    model = MODNet()
    if args.ckpt_path:
        params = load_params(model, args.ckpt_path)
    else:
        print("[matting] WARNING: no --ckpt-path; random weights")
        params = model.init(
            jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
        )
    fn = make_matting_fn(model, params, ref_size=args.ref_size)

    os.makedirs(args.output_path, exist_ok=True)
    try:
        from PIL import Image
    except ImportError:  # pragma: no cover - PIL is in the image
        raise SystemExit("PIL required for image IO")

    for name in sorted(os.listdir(args.input_path)):
        if not name.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        img = np.asarray(Image.open(
            os.path.join(args.input_path, name)).convert("RGB"))
        matte = fn(img)
        out = os.path.join(
            args.output_path, os.path.splitext(name)[0] + "_matte.png")
        Image.fromarray((matte * 255).astype(np.uint8)).save(out)
        print(f"[matting] {name} -> {out}")


if __name__ == "__main__":
    main()
