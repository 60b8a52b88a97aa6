"""Train a real style-transfer network against a FIXED style target and
export the zoo artifact.

The reference ships five trained fast-neural-style models
(modelzoo/StyleTransfer/*-9_simplified.json); with no network egress
(no VGG for a perceptual loss, no style images) the network is trained to
reproduce a fixed PROCEDURAL stylization: a saturating painterly color
remap plus dark edge strokes — a deterministic target function any
correct image-to-image network can fit. That keeps the gate a TRUE
metric (output-vs-target PSNR on held-out images, which must also beat
the identity mapping by a wide margin), while training exercises exactly
the numerics the r3 verdict called hairy: instance norm, stride-2
deconvs, long residual chains — under real gradients through the
framework's own differentiable forward.

The network is fully convolutional, so it trains on 64x64 crops and
exports at the zoo's 224x224 input (instance norm is
resolution-independent).

Usage: python -m shadernn_tpu.tools.train_styletransfer [--steps 400]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from shadernn_tpu.tools.train_resnet18 import ARTIFACT_DIR, synth_cls


def synth_imgs(rng: np.random.Generator, n: int, s: int = 64) -> np.ndarray:
    """Structured content images in [0,1]: the classifier task's shapes /
    stripes / textures over a random global color gradient."""
    imgs, _ = synth_cls(rng, n, s=s)
    yy, xx = np.mgrid[0:s, 0:s] / float(s)
    for i in range(n):
        ca, cb = rng.uniform(0, 1, (2, 3))
        th = rng.uniform(0, 2 * np.pi)
        t = (xx * np.cos(th) + yy * np.sin(th) + 1) / 2
        grad = ca + (cb - ca) * t[..., None]
        a = rng.uniform(0.3, 0.7)
        imgs[i] = np.clip(a * imgs[i] + (1 - a) * grad, 0, 1)
    return imgs.astype(np.float32)


# Per-style fixed stylizations (the reference ships candy/mosaic/... as
# per-style trained weights over ONE architecture): a full-rank color
# mixing matrix + offset, tone compressed through tanh, Sobel-edge
# darkening (candy's dark strokes), and for mosaic a soft color
# posterization (tile-like flat color fields). All components are
# pointwise or local-edge functions — translation-equivariant, so a CNN
# can actually fit them (an absolute-position pattern could not be learned
# by a padding-agnostic conv net). Deterministic; doubles as ground truth.
STYLES = {
    "candy": dict(
        mix=np.array(
            [[0.9, 0.4, -0.1], [-0.2, 1.0, 0.3], [0.3, -0.3, 0.9]],
            np.float32,
        ),
        off=np.array([0.05, -0.05, 0.1], np.float32),
        tone=2.5,
        edge=0.6,
        posterize=0,
    ),
    "mosaic": dict(
        mix=np.array(
            [[1.1, -0.2, 0.2], [0.1, 0.8, 0.2], [-0.1, 0.4, 0.8]],
            np.float32,
        ),
        off=np.array([-0.02, 0.08, 0.02], np.float32),
        tone=3.5,
        edge=0.35,
        posterize=5,  # soft-quantized color fields = the tesserae look
    ),
    "pointilism": dict(  # saturated dabs: strong quantization, light edges
        mix=np.array(
            [[1.2, 0.1, -0.2], [-0.1, 1.1, 0.1], [0.1, -0.2, 1.2]],
            np.float32,
        ),
        off=np.array([0.02, 0.0, 0.04], np.float32),
        tone=3.0,
        edge=0.15,
        posterize=7,
    ),
    "rain-princess": dict(  # warm, soft tonal palette, painterly strokes
        mix=np.array(
            [[1.15, 0.25, -0.05], [0.1, 0.95, 0.1], [-0.05, 0.15, 0.8]],
            np.float32,
        ),
        off=np.array([0.08, 0.02, -0.04], np.float32),
        tone=1.8,
        edge=0.45,
        posterize=0,
    ),
    "udnie": dict(  # desaturated, high-contrast fauvist look
        mix=np.array(
            [[0.65, 0.45, 0.15], [0.35, 0.55, 0.25], [0.25, 0.35, 0.5]],
            np.float32,
        ),
        off=np.array([-0.05, -0.02, 0.05], np.float32),
        tone=3.2,
        edge=0.5,
        posterize=0,
    ),
}

# Back-compat aliases (the 64^2 candy-equivalent artifact + its gates were
# built against these module-level names).
_MIX = STYLES["candy"]["mix"]
_OFF = STYLES["candy"]["off"]


def style_target(x: np.ndarray, style: str = "candy") -> np.ndarray:
    """x (N,H,W,3) in [0,1] -> stylized target in [0,1]."""
    p = STYLES[style]
    y = x @ p["mix"].T + p["off"]
    y = 0.5 + 0.5 * np.tanh(p["tone"] * (y - 0.5))  # painterly tone curve
    if p["posterize"]:
        # smooth staircase: sum of tanh steps — flat color fields with
        # soft transitions (fittable by the network, unlike a hard floor)
        L = p["posterize"]
        steps = np.zeros_like(y)
        for k in range(1, L):
            steps += 0.5 * (1.0 + np.tanh(12.0 * (y - k / L)))
        y = steps / (L - 1)
    luma = x @ np.array([0.299, 0.587, 0.114], np.float32)
    gx = np.zeros_like(luma)
    gy = np.zeros_like(luma)
    gx[:, :, 1:-1] = luma[:, :, 2:] - luma[:, :, :-2]
    gy[:, 1:-1, :] = luma[:, 2:, :] - luma[:, :-2, :]
    edges = np.minimum(np.sqrt(gx**2 + gy**2) * 2.5, 1.0)
    y = y * (1.0 - p["edge"] * edges[..., None])
    return np.clip(y, 0, 1).astype(np.float32)


def build_trainable(batch: int, hw: int = 64):
    import shadernn_tpu as snn
    from shadernn_tpu.engine.compile import compile_graph
    from shadernn_tpu.models import build_model

    graph = build_model("styletransfer", h=hw, w=hw)
    m = compile_graph(
        graph,
        snn.EngineOptions(
            precision=snn.Precision.FP32, backend=snn.BackendKind.XLA,
            batch_size=batch,
        ),
    )
    return graph, m


def train(steps: int = 400, batch: int = 32, seed: int = 0, log=print,
          hw: int = 64, style: str = "candy", init_from: str = None,
          peak_lr: float = 1e-3):
    import jax
    import jax.numpy as jnp
    import optax

    graph, m = build_trainable(batch, hw=hw)
    (in_name,) = graph.input_names
    out_name = graph.output_names[0]
    fwd = m.forward
    params = m.params
    if init_from:
        # warm-start from an existing artifact (e.g. a sibling style or a
        # lower-resolution fit): weights are resolution-independent, so
        # this skips the slow from-scratch climb out of the identity basin
        from shadernn_tpu.graph.parser import parse_model_file

        src = parse_model_file(init_from)
        loaded = 0
        for name, d in params.items():
            if name in src.nodes:
                for k in d:
                    if k in src.nodes[name].params:
                        d[k] = jnp.asarray(src.nodes[name].params[k],
                                           jnp.float32)
                        loaded += 1
        log(f"warm-start: {loaded} tensors from {init_from}")

    def loss_fn(p, x, t):
        y = fwd(p, {in_name: x})[out_name]
        return jnp.mean((y - t) ** 2)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, peak_lr, min(30, steps // 4), steps
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, x, t):
        l, g = jax.value_and_grad(loss_fn)(p, x, t)
        updates, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, updates), opt, l

    rng = np.random.default_rng(seed)
    for it in range(steps):
        x = synth_imgs(rng, batch, s=hw)
        t = style_target(x, style=style)
        params, opt, l = step(params, opt, jnp.asarray(x), jnp.asarray(t))
        if it % 25 == 0 or it == steps - 1:
            log(f"step {it}: mse {float(l):.5f}")
    return graph, m, params


def evaluate(graph, m, params, n=64, seed=777, batch=32, hw: int = 64,
             style: str = "candy"):
    """Held-out PSNR of (network output vs style target), and of the
    identity mapping (input vs target) as the must-beat floor."""
    import jax.numpy as jnp

    from shadernn_tpu.utils.metrics import psnr

    (in_name,) = graph.input_names
    out_name = graph.output_names[0]
    rng = np.random.default_rng(seed)
    net_db, id_db = [], []
    for _ in range(max(n // batch, 1)):
        x = synth_imgs(rng, batch, s=hw)
        t = style_target(x, style=style)
        y = np.asarray(m.forward(params, {in_name: jnp.asarray(x)})[out_name])
        net_db.append(psnr(np.clip(y, 0, 1), t))
        id_db.append(psnr(x, t))
    return float(np.mean(net_db)), float(np.mean(id_db))


def export(graph, params, out_dir: str, hw: int = 224, log=print,
           name: str = "styletransfer_trained"):
    from shadernn_tpu.graph.serialize import save_model
    from shadernn_tpu.models import build_model

    # re-build at the serving input size (fully convolutional + instance
    # norm: weights are resolution-independent) and inject trained weights
    g_out = build_model("styletransfer", h=hw, w=hw)
    for pname, d in params.items():
        node = g_out.nodes[pname]
        for k, v in d.items():
            node.params[k] = np.asarray(v)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.json")
    save_model(g_out, path, decouple=True)
    log(f"saved {path} (+ _layers.json/_weights.bin)")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--out", default=ARTIFACT_DIR)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--style", default="candy", choices=sorted(STYLES))
    ap.add_argument("--hw", type=int, default=64,
                    help="TRAIN and GATE resolution; VERDICT r4 #2: the "
                    "learned mapping does not transfer across scales "
                    "(instance-norm statistics are content-scale "
                    "dependent), so train AT the serving resolution")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--export-hw", type=int, default=None,
                    help="artifact input size (default: same as --hw)")
    ap.add_argument("--name", default=None,
                    help="artifact base name (default: "
                    "styletransfer_trained for candy@64, else "
                    "styletransfer_<style><hw>_trained)")
    ap.add_argument("--init-from", default=None,
                    help="warm-start weights from an existing artifact "
                    "(_layers.json path)")
    ap.add_argument("--peak-lr", type=float, default=1e-3)
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    graph, m, params = train(args.steps, batch=args.batch, hw=args.hw,
                             style=args.style, init_from=args.init_from,
                             peak_lr=args.peak_lr)
    net_db, id_db = evaluate(graph, m, params, batch=args.batch, hw=args.hw,
                             style=args.style)
    print(f"held-out PSNR vs target ({args.style}@{args.hw}): "
          f"net {net_db:.2f} dB, identity {id_db:.2f} dB")
    name = args.name or (
        "styletransfer_trained" if (args.style, args.hw) == ("candy", 64)
        else f"styletransfer_{args.style}{args.hw}_trained"
    )
    # the legacy candy@64 artifact ships at the 224 zoo config shape; the
    # per-style serving artifacts ship at their train/gate resolution
    export_hw = args.export_hw or (
        224 if name == "styletransfer_trained" else args.hw
    )
    export(graph, params, args.out, hw=export_hw, name=name)


if __name__ == "__main__":
    main()
