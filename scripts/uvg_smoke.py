"""UVG-shape smoke: prove the 1920x960 configs run end-to-end (VERDICT
round-1 item 9). Builds a synthetic 24-frame 1920x960 clip, runs a short
stage-1 regress and a short stage-3 calibration through the real CLIs for
both UVG configs, and prints the final PSNRs.

Usage: python scripts/uvg_smoke.py [epochs] [calib_iters]
"""

import glob
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CLIP = "/tmp/uvg_synth"


def make_clip(n=24, h=960, w=1920):
    import numpy as np
    from PIL import Image

    os.makedirs(CLIP, exist_ok=True)
    if len(glob.glob(os.path.join(CLIP, "*.png"))) == n:
        return
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for t in range(n):
        img = np.zeros((h, w, 3), np.float32)
        img[..., 0] = 0.5 + 0.5 * np.sin(xx / 97.0 + t * 0.3)
        img[..., 1] = 0.5 + 0.5 * np.cos(yy / 61.0 - t * 0.2)
        img[..., 2] = (xx + yy + 13 * t) % 255 / 255.0
        cx, cy = 200 + 60 * t, 300 + 20 * t
        img[cy:cy + 120, cx:cx + 120] = [0.9, 0.15, 0.2]
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(CLIP, f"{t + 1:04d}.png"))


def last_psnr(outdir):
    logs = sorted(glob.glob(os.path.join(outdir, "**/*.log"), recursive=True))
    text = open(logs[-1]).read()
    return [float(v) for v in re.findall(r"best_pred_seen_psnr: ([\d.]+)", text)] \
        or [float(v) for v in re.findall(r"pred_seen_psnr: ([\d.]+)", text)]


def main(epochs=10, calib_iters=480, only=None):
    from neuroquant_tpu.methods import calibrate_network, regress

    make_clip()
    os.chdir(os.path.join(os.path.dirname(__file__), ".."))
    for arch, cfgp in (("hnerv", "configs/HNeRV/UVG_1920x960_3M.yaml"),
                       ("nerv", "configs/NeRV/UVG_1920x960_3M.yaml")):
        if only and arch != only:
            continue
        import yaml
        cfg = yaml.safe_load(open(cfgp))
        cfg["epoch"], cfg["eval_freq"] = int(epochs), max(int(epochs) // 2, 1)
        tmp_cfg = f"/tmp/uvg_{arch}.yaml"
        yaml.safe_dump(cfg, open(tmp_cfg, "w"))
        outf = f"uvg_smoke/{arch}"
        regress.main(["--config", tmp_cfg, "--arch", arch,
                      "--data_path", CLIP, "--vid", "UVGsynth",
                      "--outf", outf])
        ckpt = glob.glob(f"results/{outf}/**/epoch{epochs}.pth",
                         recursive=True)[0]
        print(f"[uvg_smoke] {arch} stage-1 PSNRs: "
              f"{last_psnr(os.path.dirname(ckpt))}")
        calibrate_network.main([
            "--config", tmp_cfg, "--arch", arch, "--data_path", CLIP,
            "--vid", "UVGsynth", "--outf", outf, "--ckpt", ckpt,
            "--precision", "6", "5", "4", "5", "5", "6", "6",
            "--channel_wise", "--hadamard", "--batch_size", "2",
            "--iters_w", str(calib_iters), "--lr", "0.003",
            "--warmup", "0.2", "--calib_ckpt_freq", "0"])
        calib_logs = glob.glob(
            f"results/{outf}/**/network-wise_calib/**/*.log", recursive=True)
        text = open(sorted(calib_logs)[-1]).read()
        psnrs = [float(v) for v in
                 re.findall(r"best_pred_seen_psnr: ([\d.]+)", text)]
        print(f"[uvg_smoke] {arch} calib evals (fp32/off/unopt/opt): {psnrs[:4]}")


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if args and args[-1] in ("hnerv", "nerv"):
        only = args.pop()
    main(*(int(a) for a in args[:2]), only=only)
