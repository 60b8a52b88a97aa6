"""Train a real MobileNetV2 classifier and export the zoo artifact.

The reference ships trained MobileNetV2 weights
(modelzoo/MobileNetV2/mobilenetv2_ft.json, validated layer-by-layer by
demo/test/unittest/mobilenetv2Test.cpp); with no network egress the model
is trained on the same procedural 10-class image task as the ResNet18
artifact (tools/train_resnet18.synth_cls) so the accuracy gate is a TRUE
top-1 metric, not precision-agreement on seeded weights.

Training runs through the framework's own differentiable forward (XLA
backend, fp32) — exercising depthwise convs, relu6, inverted-residual
adds, adaptive average pooling and the softmax head under real gradients.
BatchNorm statistics stay frozen at (0, 1) with the affine trained
(inference-mode semantics identical between train and test); residual
blocks get zero-init'd project-BN gamma so each block starts as identity
(variance does not double per block).

Usage: python -m shadernn_tpu.tools.train_mobilenetv2 [--steps 700]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from shadernn_tpu.tools.train_resnet18 import ARTIFACT_DIR, synth_cls


def build_trainable(width_mult: float, batch: int, hw: int = 32):
    import shadernn_tpu as snn
    from shadernn_tpu.engine.compile import compile_graph
    from shadernn_tpu.models import build_model

    graph = build_model("mobilenetv2", h=hw, w=hw, num_classes=10,
                        width_mult=width_mult)
    m = compile_graph(
        graph,
        snn.EngineOptions(
            precision=snn.Precision.FP32, backend=snn.BackendKind.XLA,
            batch_size=batch, fold_batchnorm=False,
        ),
    )
    return graph, m


def train(steps: int = 700, width_mult: float = 0.5, batch: int = 128,
          seed: int = 0, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    graph, m = build_trainable(width_mult, batch)
    (in_name,) = graph.input_names
    out_name = graph.output_names[0]
    fwd = m.forward
    params = m.params

    # Identity-at-init residual blocks: zero the project-BN gamma of every
    # block that ends in an Add (same fix as train_resnet18; without it
    # the residual chain doubles activation variance per block under
    # frozen BN statistics).
    residual_blocks = {
        n.name.rsplit("_add", 1)[0]
        for n in graph.nodes.values() if n.name.endswith("_add")
    }
    for blk in residual_blocks:
        bn = f"{blk}_project_bn"
        if bn in params and "gamma" in params[bn]:
            params[bn]["gamma"] = jnp.zeros_like(params[bn]["gamma"])

    def loss_fn(p, x, y):
        probs = fwd(p, {in_name: x})[out_name]  # softmax head
        logp = jnp.log(jnp.clip(probs, 1e-8))
        return -jnp.mean(logp[jnp.arange(y.shape[0]), y])

    labels = {
        n: {k: ("freeze" if k in ("mean", "variance") else "train") for k in d}
        for n, d in params.items()
    }
    sched = optax.warmup_cosine_decay_schedule(0.0, 2e-3, 50, steps)
    tx = optax.multi_transform(
        {
            "train": optax.chain(
                optax.clip_by_global_norm(1.0), optax.adam(sched)
            ),
            "freeze": optax.set_to_zero(),
        },
        labels,
    )
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, x, y):
        l, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, updates), opt, l

    rng = np.random.default_rng(seed)
    for it in range(steps):
        x, y = synth_cls(rng, batch)
        params, opt, l = step(params, opt, jnp.asarray(x), jnp.asarray(y))
        if it % 50 == 0 or it == steps - 1:
            log(f"step {it}: loss {float(l):.4f}")
    return graph, m, params


def evaluate(graph, m, params, n=512, seed=777, batch=128):
    import jax.numpy as jnp

    (in_name,) = graph.input_names
    out_name = graph.output_names[0]
    rng = np.random.default_rng(seed)
    correct = 0
    for _ in range(n // batch):
        x, y = synth_cls(rng, batch)
        pred = np.asarray(m.forward(params, {in_name: jnp.asarray(x)})[out_name])
        correct += int((pred.argmax(-1) == y).sum())
    return correct / (n // batch * batch)


def export(graph, params, out_dir: str, log=print):
    from shadernn_tpu.graph.serialize import save_model

    for name, d in params.items():
        node = graph.nodes[name]
        for k, v in d.items():
            node.params[k] = np.asarray(v)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "mobilenetv2_cls10_trained.json")
    save_model(graph, path, decouple=True)
    log(f"saved {path} (+ _layers.json/_weights.bin)")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=700)
    ap.add_argument("--width_mult", type=float, default=0.5)
    ap.add_argument("--out", default=ARTIFACT_DIR)
    ap.add_argument("--platform", default="cpu",
                    help="train on cpu by default: the remote-tunnel TPU "
                    "pays minutes of compile latency for a minutes-long job")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    graph, m, params = train(args.steps, args.width_mult)
    acc = evaluate(graph, m, params)
    print(f"held-out top-1: {acc:.3f}")
    export(graph, params, args.out)


if __name__ == "__main__":
    main()
