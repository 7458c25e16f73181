"""Export LPIPS (alex) weights to the npz ``gstex_tpu.utils.lpips`` loads.

Run this OFF-box (anywhere with torchvision + lpips installed — this repo's
environment is zero-egress and cannot download the pretrained weights):

    python tools/export_lpips.py weights/lpips_alex.npz

It pulls torchvision's ImageNet AlexNet conv weights and the LPIPS v0.1
learned lin weights (richzhang/PerceptualSimilarity) and writes the 15
arrays (conv{i}_w, conv{i}_b, lin{i}_w).
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips as lpips_pkg   # pip install lpips
    import torch

    net = lpips_pkg.LPIPS(net="alex", version="0.1")
    arrays = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    convs = [m for m in convs if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, convs
    for i, c in enumerate(convs):
        arrays[f"conv{i}_w"] = c.weight.detach().numpy().astype(np.float32)
        arrays[f"conv{i}_b"] = c.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()   # (1, C, 1, 1)
        arrays[f"lin{i}_w"] = w.reshape(-1).astype(np.float32)
    np.savez(out_path, **arrays)
    print(f"wrote {out_path}: " + ", ".join(sorted(arrays)))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_alex.npz")
