"""Train a real ResNet18-CIFAR classifier and export the zoo artifact.

The reference validates ResNet18 with REAL trained weights, layer by layer
and end to end (demo/test/unittest/resnet18Test.cpp:87-152,
demo/test_resnet18.sh); its zoo ships the trained CIFAR-10 model
(modelzoo/Resnet18/resnet18_cifar10.json). This container has no network
egress (no CIFAR download), so — following the train_espcn.py pattern —
the classifier is trained on a procedurally generated 10-class image
task whose classes exercise exactly what a CIFAR CNN needs: color/shape
composition, translation invariance, texture vs shape discrimination.

Training runs through the framework's OWN differentiable forward
(engine/compile.py builds a pure (params, inputs) -> outputs function;
XLA backend, fp32), which doubles as a gradient-correctness exercise of
the whole op layer. BatchNorm statistics stay frozen at (0, 1) — the
affine (gamma, beta) is trained, which is equivalent for a from-scratch
fit and keeps inference-mode semantics identical between train and test.

The artifact is width-scaled (base_filters=16, ~2.9 MB fp32) so real
weights fit in the repo; the topology (stem + 4 stages x 2 basic blocks
+ GAP + fc10, with downsample shortcuts) is exactly the zoo graph, so
every layer-semantics bug the full-width model could hit is exercised.

Usage: python -m shadernn_tpu.tools.train_resnet18 [--steps 600]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "..", "models", "artifacts")
N_CLASSES = 10


def synth_cls(rng: np.random.Generator, n: int, s: int = 32):
    """n procedural (s, s, 3) images in [0,1] + labels.

    10 classes: 0 disc, 1 square, 2 triangle, 3 cross, 4 h-stripes,
    5 v-stripes, 6 checkerboard, 7 ring, 8 diagonal bar, 9 dot field.
    Random fg/bg colors, position/scale jitter, additive noise."""
    yy, xx = np.mgrid[0:s, 0:s] / float(s)
    imgs = np.empty((n, s, s, 3), np.float32)
    labels = rng.integers(0, N_CLASSES, n)
    for i in range(n):
        k = labels[i]
        bg = rng.uniform(0.0, 0.6, 3)
        fg = rng.uniform(0.4, 1.0, 3)
        while np.abs(fg - bg).sum() < 0.6:  # keep figure visible
            fg = rng.uniform(0.0, 1.0, 3)
        cx, cy = rng.uniform(0.3, 0.7, 2)
        r = rng.uniform(0.15, 0.3)
        m = np.zeros((s, s), bool)
        if k == 0:
            m = (xx - cx) ** 2 + (yy - cy) ** 2 < r * r
        elif k == 1:
            m = (np.abs(xx - cx) < r) & (np.abs(yy - cy) < r)
        elif k == 2:
            m = (yy > cy - r) & (yy < cy + r) & (
                np.abs(xx - cx) < (yy - (cy - r)) / 2
            )
        elif k == 3:
            w = r / 2.5
            m = ((np.abs(xx - cx) < w) & (np.abs(yy - cy) < r)) | (
                (np.abs(yy - cy) < w) & (np.abs(xx - cx) < r)
            )
        elif k == 4:
            f = rng.integers(3, 6)
            m = (np.floor(yy * f * 2) % 2).astype(bool)
        elif k == 5:
            f = rng.integers(3, 6)
            m = (np.floor(xx * f * 2) % 2).astype(bool)
        elif k == 6:
            f = rng.integers(2, 4)
            m = ((np.floor(xx * f * 2) + np.floor(yy * f * 2)) % 2).astype(bool)
        elif k == 7:
            d2 = (xx - cx) ** 2 + (yy - cy) ** 2
            m = (d2 < r * r) & (d2 > (r * 0.55) ** 2)
        elif k == 8:
            th = rng.uniform(np.pi / 6, np.pi / 3) * rng.choice([-1, 1])
            d = (xx - cx) * np.cos(th) + (yy - cy) * np.sin(th)
            m = np.abs(d) < r / 3
        else:
            for _ in range(12):
                px, py = rng.uniform(0.1, 0.9, 2)
                m |= (xx - px) ** 2 + (yy - py) ** 2 < 0.002
        img = np.where(m[..., None], fg, bg)
        img += rng.normal(0, 0.05, img.shape)
        imgs[i] = np.clip(img, 0, 1)
    return imgs, labels.astype(np.int32)


def build_trainable(base_filters: int, batch: int):
    import shadernn_tpu as snn
    from shadernn_tpu.engine.compile import compile_graph
    from shadernn_tpu.models import build_model

    graph = build_model("resnet18", base_filters=base_filters)
    m = compile_graph(
        graph,
        snn.EngineOptions(
            precision=snn.Precision.FP32, backend=snn.BackendKind.XLA,
            batch_size=batch, fold_batchnorm=False,
        ),
    )
    return graph, m


def train(steps: int = 600, base_filters: int = 16, batch: int = 128,
          seed: int = 0, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    graph, m = build_trainable(base_filters, batch)
    (in_name,) = graph.input_names
    out_name = graph.output_names[0]
    fwd = m.forward
    params = m.params
    # Zero-init-residual: with BN statistics frozen, residual adds double
    # the signal variance every block (2^8 by the head -> saturated
    # softmax, vanished gradients). Zeroing each block's second BN gamma
    # makes blocks identity at init — the standard fix.
    for name, d in params.items():
        if name.endswith("_bn2") and "gamma" in d:
            d["gamma"] = jnp.zeros_like(d["gamma"])

    def loss_fn(p, x, y):
        logits = fwd(p, {in_name: x})[out_name]  # softmax output (fc head)
        logp = jnp.log(jnp.clip(logits, 1e-8))
        return -jnp.mean(logp[jnp.arange(y.shape[0]), y])

    # Freeze BN running stats (multi_transform, NOT optax.masked: masked
    # passes the raw gradient through for unmasked leaves, which would
    # drift variance negative -> rsqrt NaN).
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
    for i in range(0, n, batch):
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
    path = os.path.join(out_dir, "resnet18_cls10_trained.json")
    save_model(graph, path, decouple=True)
    log(f"saved {path} (+ _layers.json/_weights.bin)")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--base_filters", type=int, default=16)
    ap.add_argument("--out", default=ARTIFACT_DIR)
    ap.add_argument("--platform", default="cpu",
                    help="train on cpu by default: the remote-tunnel TPU "
                    "pays minutes of compile latency for a minutes-long job")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    graph, m, params = train(args.steps, args.base_filters)
    acc = evaluate(graph, m, params)
    print(f"held-out top-1: {acc:.3f}")
    export(graph, params, args.out)


if __name__ == "__main__":
    main()
