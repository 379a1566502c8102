"""Model analysis: parameters / FLOPs / inference speed / structure.

Parity target: reference `tools/analyze.py` — tasks `speed` (fps with warm
start, :43-86), `flop`, `parameter`, `structure` (:88-197). FLOPs come from
XLA's own cost analysis (`jax.jit(...).lower().compile().cost_analysis()`)
instead of fvcore.

Usage:
  python tools/analyze.py --tasks speed flop parameter --config <yaml> \
      --model boxer2d [--height 800 --width 1216]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args):
    import jax
    import jax.numpy as jnp

    from boxer_tpu.models import build_model
    from boxer_tpu.utils.config import Configuration

    extra = {"task": args.task, "model": args.model}
    configuration = Configuration(config_path=args.config, opts=args.opts,
                                  extra=extra)
    config = configuration.get_config()
    try:
        model_cfg = config.model_config[args.model]
    except KeyError:
        raise SystemExit(
            f"model_config.{args.model} not found — pass --config "
            "<experiment yaml> (e.g. boxer_tpu/config/COCO-Detection/"
            "boxer2d_r50_3x.yaml)")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(model_cfg, args.num_classes, dtype=dtype)

    image = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
    mask = jnp.zeros((1, args.height, args.width), bool)
    variables = jax.jit(
        lambda r: model.init(r, image, mask, train=False)
    )(jax.random.PRNGKey(0))
    return model, variables, image, mask


def task_parameter(model, variables, *_):
    import numpy as np
    import jax

    total = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(variables["params"]))
    frozen = sum(int(np.prod(l.shape))
                 for l in jax.tree_util.tree_leaves(
                     variables.get("constants", {})))
    print(f"parameters: {total / 1e6:.2f}M trainable "
          f"(+{frozen / 1e6:.2f}M frozen stats)")


def task_flop(model, variables, image, mask):
    import jax

    fn = jax.jit(lambda i, m: model.apply(variables, i, m, train=False,
                                          inference=True)["pred_boxes"])
    compiled = fn.lower(image, mask).compile()
    cost = compiled.cost_analysis()
    if cost:
        flops = cost.get("flops", float("nan"))
        print(f"flops: {flops / 1e9:.2f} GFLOPs / image "
              f"(XLA cost analysis)")
    else:
        print("flops: cost analysis unavailable on this backend")


def task_speed(model, variables, image, mask, iters: int = 50):
    import jax

    fn = jax.jit(lambda i, m: model.apply(variables, i, m, train=False,
                                          inference=True)["pred_boxes"])
    out = fn(image, mask)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(image, mask)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"speed: {iters / dt:.2f} img/s ({dt / iters * 1e3:.1f} ms/img, "
          f"bs=1 warm)")


def task_structure(model, variables, *_):
    import numpy as np
    import jax

    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        print(f"{name:80s} {str(leaf.shape):20s} {np.prod(leaf.shape):>12,}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tasks", nargs="+", default=["parameter"],
                        choices=["speed", "flop", "parameter", "structure"])
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--task", type=str, default="detection")
    parser.add_argument("--model", type=str, default="boxer2d")
    parser.add_argument("--num-classes", type=int, default=91)
    parser.add_argument("--height", type=int, default=800)
    parser.add_argument("--width", type=int, default=1216)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args()

    model, variables, image, mask = build(args)
    for t in args.tasks:
        {"speed": task_speed, "flop": task_flop,
         "parameter": task_parameter, "structure": task_structure}[t](
            model, variables, image, mask)


if __name__ == "__main__":
    main()
