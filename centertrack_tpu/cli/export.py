"""Model export (reference: src/convert_onnx.py).

The reference exports ONNX; the TPU-native equivalents are:
  * serialized StableHLO via jax.export — portable, versioned IR that
    any XLA-backed runtime can load;
  * a TensorFlow SavedModel via jax2tf (optional; TF is present here),
    which tools downstream can convert to ONNX/TFLite.

The exported function is the raw multi-head forward; with
--model_output_list the outputs are a list sorted by head name,
mirroring the reference's ONNX forward contract
(reference: base_model.py:79-84).

Usage:
  python -m centertrack_tpu.cli.export tracking --dataset mot \
      --load_model model.ckpt --out model.stablehlo
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from centertrack_tpu.cli.opts import build_parser, args_to_config
from centertrack_tpu.config import finalize
from centertrack_tpu.models.model import create_model, init_model, load_model


def build_forward(cfg, model, params, batch_stats):
    heads_sorted = sorted(cfg.heads_dict)

    def forward(frame, pre_img, pre_hm):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          frame, pre_img if cfg.pre_img else None,
                          pre_hm if cfg.pre_hm else None,
                          train=False)[-1]
        if cfg.model_output_list:
            return [out[h] for h in heads_sorted]
        return out

    shape = (1, cfg.input_h, cfg.input_w, 3)
    args = (jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros((1, cfg.input_h, cfg.input_w, 1), jnp.float32))
    return forward, args


def export_stablehlo(forward, args, out_path: str) -> None:
    exported = jax.export.export(jax.jit(forward))(*args)
    with open(out_path, "wb") as f:
        f.write(exported.serialize())
    print(f"serialized StableHLO -> {out_path} "
          f"({os.path.getsize(out_path)} bytes)")


def export_savedmodel(forward, args, out_dir: str) -> None:
    import tensorflow as tf
    from jax.experimental import jax2tf
    tf_fn = tf.function(
        jax2tf.convert(forward, with_gradient=False),
        autograph=False,
        input_signature=[
            tf.TensorSpec(a.shape, tf.float32) for a in args])
    module = tf.Module()
    module.f = tf_fn
    tf.saved_model.save(module, out_dir)
    print(f"TF SavedModel -> {out_dir}")


def main(argv=None):
    parser = build_parser()
    parser.add_argument("--out", default="model.stablehlo")
    parser.add_argument("--saved_model_dir", default="")
    args = parser.parse_args(argv)
    cfg = args_to_config(args)
    cfg = finalize(cfg)
    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    params, batch_stats = init_model(model, cfg)
    if cfg.load_model:
        ckpt = load_model(cfg.load_model, params, batch_stats)
        params, batch_stats = ckpt["params"], ckpt["batch_stats"]
    forward, ex_args = build_forward(cfg, model, params, batch_stats)
    export_stablehlo(forward, ex_args, args.out)
    if args.saved_model_dir:
        export_savedmodel(forward, ex_args, args.saved_model_dir)


if __name__ == "__main__":
    main()
