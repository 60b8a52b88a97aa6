"""Generate docs/Accuracy.md: precision-delta table for every zoo model
plus the trained-ESPCN quality gates.

The reference validates each model against a per-layer oracle and an
end-to-end ground truth (testutil.h:1194-1195, test_espcn.sh:45-57); the
BASELINE.md contract additionally bounds the bf16/int8 accuracy delta vs
fp32. This tool measures those deltas on every zoo model (same seeded
input, fp32 vs bf16 vs int8 engines) and — for the trained ESPCN artifact
— real image-quality numbers (PSNR vs the bilinear baseline per
precision).

Usage: python -m shadernn_tpu.tools.accuracy_report [--out docs/Accuracy.md]
"""

from __future__ import annotations

import argparse
import os
from typing import Dict

import numpy as np

# Model -> (metric kind, extra builder kwargs for a tractable geometry)
ZOO_KINDS: Dict[str, tuple] = {
    "espcn": ("sr", {}),
    "styletransfer": ("sr", {}),
    "spatialdenoise": ("sr", {}),
    "aidenoise": ("sr", {}),
    "unet": ("sr", {"base_filters": 32}),
    "mobilenetv2": ("classification", {}),
    "resnet18": ("classification", {}),
    "yolov3-tiny": ("detection", {}),
}


def measure_model(name: str, kind: str, log=print, **kwargs) -> Dict[str, dict]:
    import shadernn_tpu as snn
    from shadernn_tpu.models import build_model
    from shadernn_tpu.utils.metrics import precision_delta_report

    rows = {}
    engines = {}
    for prec in (snn.Precision.FP32, snn.Precision.BF16, snn.Precision.INT8):
        g = build_model(name, **kwargs)
        engines[prec] = snn.Engine.from_graph(
            g, snn.EngineOptions(precision=prec, batch_size=1)
        )
    in_shape = engines[snn.Precision.FP32].model.input_specs[
        engines[snn.Precision.FP32].graph.input_names[0]
    ]
    x = np.random.default_rng(0).random((1, *in_shape[1:]), dtype=np.float32)
    inputs = {engines[snn.Precision.FP32].graph.input_names[0]: x}
    rkind = "sr" if kind == "sr" else (
        "classification" if kind == "classification" else "raw")
    for prec, label in ((snn.Precision.BF16, "bf16"), (snn.Precision.INT8, "int8")):
        rep = precision_delta_report(
            engines[snn.Precision.FP32], engines[prec], inputs,
            kind=rkind if rkind != "raw" else "sr",
        )
        rows[label] = rep
        log(f"{name} {label}: {rep}")
    return rows


def trained_espcn_section(log=print) -> list:
    import shadernn_tpu as snn
    from shadernn_tpu.tools.train_espcn import (
        ARTIFACT_DIR, bilinear_up2, downsample2, psnr, synth_hr,
    )

    art = os.path.join(ARTIFACT_DIR, "espcn_2x_trained_layers.json")
    if not os.path.exists(art):
        return ["(trained artifact not built — run "
                "`python -m shadernn_tpu.tools.train_espcn`)"]
    rng = np.random.default_rng(123)
    hr = synth_hr(rng, 4, 128)
    lr = downsample2(hr)
    c = 8
    crop = (slice(None), slice(c, -c), slice(c, -c))
    base = psnr(bilinear_up2(lr)[crop], hr[crop])
    lines = [
        "| output | PSNR vs ground truth (dB) |",
        "|---|---|",
        f"| bilinear 2x baseline | {base:.2f} |",
    ]
    for prec, label in ((snn.Precision.FP32, "fp32"), (snn.Precision.BF16, "bf16"),
                        (snn.Precision.INT8, "int8 (weight-only)")):
        eng = snn.Engine.from_json(
            art, snn.EngineOptions(precision=prec, batch_size=4), input_hw=(64, 64)
        )
        pred = np.asarray(eng.model.run_single(lr), np.float32)
        p = psnr(pred[crop], hr[crop])
        log(f"trained espcn {label}: {p:.2f} dB (bilinear {base:.2f})")
        lines.append(f"| trained ESPCN, {label} | {p:.2f} |")
    # A8W8: calibrate activation scales, rebuild — the packed chain then
    # runs int8 x int8 dots (chain_a8) on its calibrated layers
    from shadernn_tpu.quant.calibrate import calibrate_activations

    # backend=PALLAS so the packed chain (interpret mode on CPU) actually
    # runs the int8 dots this row claims to validate
    opts = snn.EngineOptions(precision=snn.Precision.INT8, batch_size=4,
                             backend=snn.BackendKind.PALLAS)
    eng = snn.Engine.from_json(art, opts, input_hw=(64, 64))
    calibrate_activations(eng, [{eng.graph.input_names[0]: lr}],
                          percentile=None)
    eng_a8 = snn.Engine.from_graph(eng.graph, opts)
    pred = np.asarray(eng_a8.model.run_single(lr), np.float32)
    p = psnr(pred[crop], hr[crop])
    log(f"trained espcn a8w8: {p:.2f} dB (bilinear {base:.2f})")
    lines.append(f"| trained ESPCN, int8 A8W8 (calibrated, chain_a8) | {p:.2f} |")
    return lines


def trained_resnet18_section(log=print) -> list:
    import shadernn_tpu as snn
    from shadernn_tpu.tools.train_resnet18 import ARTIFACT_DIR, synth_cls

    art = os.path.join(ARTIFACT_DIR, "resnet18_cls10_trained_layers.json")
    if not os.path.exists(art):
        return ["(trained artifact not built — run "
                "`python -m shadernn_tpu.tools.train_resnet18`)"]
    rng = np.random.default_rng(424242)
    x, y = synth_cls(rng, 256)
    lines = ["| precision | held-out top-1 |", "|---|---|"]
    for prec, label in ((snn.Precision.FP32, "fp32"), (snn.Precision.BF16, "bf16"),
                        (snn.Precision.INT8, "int8 (weight-only)")):
        eng = snn.Engine.from_json(
            art, snn.EngineOptions(precision=prec, batch_size=64))
        correct = 0
        for i in range(0, 256, 64):
            pred = np.asarray(eng.model.run_single(x[i : i + 64]))
            correct += int((pred.argmax(-1) == y[i : i + 64]).sum())
        acc = correct / 256
        log(f"trained resnet18 {label}: top-1 {acc:.3f}")
        lines.append(f"| {label} | {acc:.3f} |")
    return lines


def trained_denoiser_section(log=print) -> list:
    import shadernn_tpu as snn
    from shadernn_tpu.tools.train_denoiser import ARTIFACT_DIR, noisy_pairs
    from shadernn_tpu.tools.train_espcn import psnr

    x, y = noisy_pairs(np.random.default_rng(20260820), 8, 96)
    lines = [
        "| output | PSNR vs clean (dB) |", "|---|---|",
        f"| noisy input (identity baseline) | {psnr(x, y):.2f} |",
    ]
    for model, label_model in (("spatialdenoise", "SpatialDenoise"),
                               ("unet", "U-Net"),
                               ("aidenoise", "AIDenoise")):
        art = os.path.join(ARTIFACT_DIR, f"{model}_trained_layers.json")
        if not os.path.exists(art):
            lines.append(f"| {label_model} | (artifact not built) |")
            continue
        for prec, label in ((snn.Precision.FP32, "fp32"),
                            (snn.Precision.BF16, "bf16"),
                            (snn.Precision.INT8, "int8 (weight-only)")):
            eng = snn.Engine.from_json(
                art, snn.EngineOptions(precision=prec, batch_size=8),
                input_hw=(96, 96))
            pred = np.asarray(eng.model.run_single(x), np.float32)
            p = psnr(pred, y)
            log(f"trained {model} {label}: {p:.2f} dB")
            lines.append(f"| trained {label_model}, {label} | {p:.2f} |")
    return lines


def trained_mobilenetv2_section(log=print) -> list:
    import shadernn_tpu as snn
    from shadernn_tpu.quant.calibrate import calibrate_activations
    from shadernn_tpu.tools.train_resnet18 import ARTIFACT_DIR, synth_cls

    art = os.path.join(ARTIFACT_DIR, "mobilenetv2_cls10_trained_layers.json")
    if not os.path.exists(art):
        return ["(trained artifact not built — run "
                "`python -m shadernn_tpu.tools.train_mobilenetv2`)"]
    rng = np.random.default_rng(424242)
    x, y = synth_cls(rng, 256)

    def top1(eng):
        correct = 0
        for i in range(0, 256, 64):
            pred = np.asarray(eng.model.run_single(x[i : i + 64]))
            correct += int((pred.argmax(-1) == y[i : i + 64]).sum())
        return correct / 256

    lines = ["| precision | held-out top-1 |", "|---|---|"]
    for prec, label in ((snn.Precision.FP32, "fp32"),
                        (snn.Precision.BF16, "bf16"),
                        (snn.Precision.INT8, "int8 (weight-only)")):
        eng = snn.Engine.from_json(
            art, snn.EngineOptions(precision=prec, batch_size=64))
        acc = top1(eng)
        log(f"trained mobilenetv2 {label}: top-1 {acc:.3f}")
        lines.append(f"| {label} | {acc:.3f} |")
    # A8W8: calibrate (stamps act_scale attrs on the graph), rebuild from
    # the same graph so the scales engage, re-evaluate real top-1
    opts = snn.EngineOptions(precision=snn.Precision.INT8, batch_size=64)
    eng = snn.Engine.from_json(art, opts)
    cal_x, _ = synth_cls(np.random.default_rng(7), 64)
    calibrate_activations(eng, [{"input": cal_x}], percentile=None)
    eng_a8 = snn.Engine.from_graph(eng.graph, opts)
    acc = top1(eng_a8)
    log(f"trained mobilenetv2 a8w8: top-1 {acc:.3f}")
    lines.append(f"| int8 A8W8 (calibrated activations) | {acc:.3f} |")
    return lines


def trained_styletransfer_section(log=print) -> list:
    import shadernn_tpu as snn
    from shadernn_tpu.tools.train_resnet18 import ARTIFACT_DIR
    from shadernn_tpu.tools.train_styletransfer import style_target, synth_imgs
    from shadernn_tpu.utils.metrics import psnr

    lines = ["| artifact | eval | net PSNR vs target (dB) "
             "| identity baseline (dB) |", "|---|---|---|---|"]

    def row(art, label, s, style, n=4):
        if not os.path.exists(art):
            lines.append(f"| {label} | — | (artifact not built) | |")
            return
        # fresh generator per row: every style evaluates the SAME held-out
        # images the gate uses (tests/test_accuracy_styletransfer.py)
        rng = np.random.default_rng(99)
        eng = snn.Engine.from_json(
            art, snn.EngineOptions(batch_size=n), input_hw=(s, s))
        x = synth_imgs(rng, n, s=s)
        t = style_target(x, style=style)
        y = np.clip(np.asarray(eng.model.run_single(x), np.float32), 0, 1)
        net, ident = psnr(y, t), psnr(x, t)
        log(f"trained styletransfer {label}: net {net:.2f} id {ident:.2f}")
        lines.append(f"| {label} | {s}x{s} | {net:.2f} | {ident:.2f} |")

    row(os.path.join(ARTIFACT_DIR, "styletransfer_trained_layers.json"),
        "candy-equivalent (64-trained)", 64, "candy", n=4)
    for style in ("candy", "mosaic", "pointilism", "rain-princess",
                  "udnie"):
        row(os.path.join(
            ARTIFACT_DIR, f"styletransfer_{style}512_trained_layers.json"),
            f"{style} (512-trained)", 512, style)
    return lines


def trained_yolo_section(log=print) -> list:
    import shadernn_tpu as snn
    from shadernn_tpu.tools.train_resnet18 import ARTIFACT_DIR
    from shadernn_tpu.tools.train_yolo import NUM_CLASSES, synth_scenes
    from shadernn_tpu.utils.metrics import mean_average_precision

    art = os.path.join(ARTIFACT_DIR, "yolov3_tiny_trained_layers.json")
    if not os.path.exists(art):
        return ["(trained artifact not built — run "
                "`python -m shadernn_tpu.tools.train_yolo`)"]
    lines = ["| precision | mAP@0.5 (full pipeline: backbone -> decode -> "
             "NMS) |", "|---|---|"]
    rng = np.random.default_rng(424242)
    batches = []
    for _ in range(2):
        batches.append(synth_scenes(rng, 8))
    for prec, label in ((snn.Precision.FP32, "fp32"),
                        (snn.Precision.BF16, "bf16")):
        eng = snn.Engine.from_json(
            art, snn.EngineOptions(precision=prec, batch_size=8))
        dets, gts = [], []
        for x, gt in batches:
            out = np.asarray(eng.model.run_single(x))
            for b in range(8):
                d = out[b]
                dets.append(d[d[:, 1] > 0])
                gts.append(gt[b])
        m = mean_average_precision(dets, gts, NUM_CLASSES)
        log(f"trained yolo {label}: mAP {m:.3f}")
        lines.append(f"| {label} | {m:.3f} |")
    return lines


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "..", "docs", "Accuracy.md"))
    args = ap.parse_args(argv)

    lines = [
        "# Accuracy",
        "",
        "Generated by `python -m shadernn_tpu.tools.accuracy_report`.",
        "",
        "## Trained ESPCN (real weights)",
        "",
        "Artifact `models/artifacts/espcn_2x_trained*` — trained in-repo by",
        "`tools/train_espcn.py` (reference arch, demo/modelInferenceESPCN.py),",
        "evaluated on held-out synthetic SR data, 8px border crop. The gate",
        "(tests/test_accuracy_trained.py): beat bilinear by >0.8 dB in fp32,",
        "match keras.predict, and keep bf16/int8 within the delta bounds.",
        "",
        *trained_espcn_section(),
        "",
        "## Trained ResNet18 classifier (real weights)",
        "",
        "Artifact `models/artifacts/resnet18_cls10_trained*`"
        " (tools/train_resnet18.py): the zoo topology at base_filters=16,",
        "trained on a procedural 10-class task; true held-out top-1"
        " (gates in tests/test_accuracy_resnet18.py).",
        "",
        *trained_resnet18_section(),
        "",
        "## Trained SpatialDenoise (real weights)",
        "",
        "Artifact `models/artifacts/spatialdenoise_trained*`"
        " (tools/train_denoiser.py): true denoising PSNR vs the noisy",
        "identity baseline (gates in tests/test_accuracy_denoiser.py).",
        "",
        *trained_denoiser_section(),
        "",
        "## Trained MobileNetV2 classifier (real weights)",
        "",
        "Artifact `models/artifacts/mobilenetv2_cls10_trained*`"
        " (tools/train_mobilenetv2.py, width 0.5): true held-out top-1 per",
        "precision, incl. calibrated A8W8 (gates in",
        "tests/test_accuracy_mobilenetv2.py).",
        "",
        *trained_mobilenetv2_section(),
        "",
        "## Trained StyleTransfer (real weights)",
        "",
        "Per-style artifacts (tools/train_styletransfer.py): output-vs-",
        "procedural-target PSNR on held-out images; the network must beat",
        "the identity mapping (gates in tests/test_accuracy_styletransfer",
        ".py). candy/mosaic are trained AND evaluated at 512x512 (BASELINE",
        "configs[1]) — the r4 finding: instance-norm statistics are",
        "content-scale dependent, so training runs at the serving scale.",
        "",
        *trained_styletransfer_section(),
        "",
        "## Trained YOLOv3-tiny detector (real weights)",
        "",
        "Artifact `models/artifacts/yolov3_tiny_trained*`"
        " (tools/train_yolo.py): true mAP@0.5 through the FULL pipeline",
        "(backbone -> decode -> NMS; gates in tests/test_accuracy_yolo.py).",
        "",
        *trained_yolo_section(),
        "",
        "## Precision deltas across the zoo (seeded weights)",
        "",
        "Same seeded input through fp32/bf16/int8 engines. `psnr_db` is",
        "agreement between the two precisions' outputs (not image quality);",
        "`top1_agreement` is classification label agreement.",
        "",
        "| model | bf16 vs fp32 | int8 vs fp32 |",
        "|---|---|---|",
    ]

    def fmt(rep):
        if "top1_agreement" in rep:
            return f"top1 agree {rep['top1_agreement']:.2f}, maxdiff {rep['max_abs_diff']:.2e}"
        if "psnr_db" in rep:
            return f"psnr {rep['psnr_db']:.1f} dB, maxdiff {rep['max_abs_diff']:.2e}"
        return f"maxdiff {rep['max_abs_diff']:.2e}"

    for name, (kind, kw) in ZOO_KINDS.items():
        try:
            rows = measure_model(name, kind, **kw)
            lines.append(f"| {name} | {fmt(rows['bf16'])} | {fmt(rows['int8'])} |")
        except Exception as e:  # keep the report going; record the failure
            lines.append(f"| {name} | FAILED: {type(e).__name__}: {e} | |")

    out = os.path.abspath(args.out)
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    import logging

    import jax

    # accuracy numbers are precision comparisons, not perf: run on CPU so
    # the report never contends with (or pays remote compiles on) the chip
    jax.config.update("jax_platforms", "cpu")
    logging.disable(logging.INFO)
    main()
