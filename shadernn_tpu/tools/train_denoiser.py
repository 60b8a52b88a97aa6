"""Train a real SpatialDenoise model and export the zoo artifact.

Clone of the train_espcn.py pattern (the reference ships real trained
weights for its SpatialDenoise zoo model, modelzoo/SpatialDenoise/): the
zoo architecture (conv stack + residual add over the noisy luma,
models/spatialdenoise.py) is trained on procedurally generated
noisy->clean pairs through the framework's own differentiable forward,
then exported through graph/serialize.py. The accuracy gate is a REAL
denoising PSNR: trained weights must beat the identity (the noisy input)
by a margin no random-weight model can.

Usage: python -m shadernn_tpu.tools.train_denoiser [--steps 500]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from shadernn_tpu.tools.train_espcn import psnr, synth_hr

ARTIFACT_DIR = os.path.join(os.path.dirname(__file__), "..", "models", "artifacts")
NOISE = (0.04, 0.12)  # sigma range of the degradation model


def noisy_pairs(rng: np.random.Generator, n: int, s: int):
    clean = synth_hr(rng, n, s)
    sigma = rng.uniform(*NOISE, (n, 1, 1, 1)).astype(np.float32)
    noisy = clean + rng.normal(0, 1, clean.shape).astype(np.float32) * sigma
    return np.clip(noisy, 0, 1), clean


def train(steps: int = 500, model: str = "spatialdenoise",
          batch: int = 16, size: int = 64, seed: int = 0, log=print):
    import jax
    import jax.numpy as jnp
    import optax

    import shadernn_tpu as snn
    from shadernn_tpu.engine.compile import compile_graph
    from shadernn_tpu.models import build_model

    if model == "unet":
        # width-8 depth-3 variant so real weights fit the repo; the full
        # topology (enc/pool/deconv/skip-concat) is exercised unchanged
        graph = build_model("unet", h=size, w=size, base_filters=8, depth=3)
    elif model == "aidenoise":
        # the reference ships NO artifact for its AIDenoise runner; this
        # trains one anyway (stride-2 encoder -> subpixel decoder with a
        # global residual), closing the last untrained zoo family
        graph = build_model("aidenoise", h=size, w=size, features=16,
                            depth=3)
    else:
        graph = build_model(model, h=size, w=size, features=16, depth=4)
    m = compile_graph(
        graph,
        snn.EngineOptions(precision=snn.Precision.FP32,
                          backend=snn.BackendKind.XLA, batch_size=batch),
    )
    (in_name,) = graph.input_names
    out_name = graph.output_names[0]
    fwd, params = m.forward, m.params

    def loss_fn(p, x, y):
        pred = fwd(p, {in_name: x})[out_name]
        return jnp.mean((pred - y) ** 2)

    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 30, steps)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(sched))
    opt = tx.init(params)

    @jax.jit
    def step(p, opt, x, y):
        l, g = jax.value_and_grad(loss_fn)(p, x, y)
        u, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, u), opt, l

    rng = np.random.default_rng(seed)
    for it in range(steps):
        x, y = noisy_pairs(rng, batch, size)
        params, opt, l = step(params, opt, jnp.asarray(x), jnp.asarray(y))
        if it % 50 == 0 or it == steps - 1:
            log(f"step {it}: mse {float(l):.5f}")
    return graph, m, params


def evaluate(graph, m, params, n=16, size=128, seed=777):
    import jax.numpy as jnp

    (in_name,) = graph.input_names
    out_name = graph.output_names[0]
    rng = np.random.default_rng(seed)
    x, y = noisy_pairs(rng, n, size)
    # weights are size-agnostic; re-trace at the eval size
    pred = np.asarray(m.forward(params, {in_name: jnp.asarray(x)})[out_name])
    return psnr(pred, y), psnr(x, y)


def export(graph, params, out_dir: str, model: str = "spatialdenoise",
           log=print):
    from shadernn_tpu.graph.serialize import save_model

    for name, d in params.items():
        node = graph.nodes[name]
        for k, v in d.items():
            node.params[k] = np.asarray(v)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{model}_trained.json")
    save_model(graph, path, decouple=True)
    log(f"saved {path} (+ _layers.json/_weights.bin)")
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--model", default="spatialdenoise",
                    choices=["spatialdenoise", "unet", "aidenoise"])
    ap.add_argument("--out", default=ARTIFACT_DIR)
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", args.platform)
    graph, m, params = train(args.steps, model=args.model)
    p_model, p_noisy = evaluate(graph, m, params)
    print(f"held-out PSNR: denoised {p_model:.2f} dB vs noisy {p_noisy:.2f} dB")
    export(graph, params, args.out, model=args.model)


if __name__ == "__main__":
    main()
