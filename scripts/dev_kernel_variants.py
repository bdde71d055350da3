"""Dev analysis: Mosaic kernel variants one train step instantiates.

Compile time through the remote-compile tunnel is 4-14 min at bench scale
and scales with the number of DISTINCT Pallas kernel compiles: one per
(kernel body, static shape tuple, grid size).  This tool statically
enumerates the windowed-conv variants a (arch, caps) pair produces so
consolidation work has a number to push down.

Usage: python scripts/dev_kernel_variants.py [arch] [cap0 cap1 ...]
"""

import sys
from collections import Counter
from os.path import dirname, abspath

sys.path.insert(0, dirname(dirname(abspath(__file__))))

from openscene_tpu.models.sparse_unet import ARCHS
from openscene_tpu.sparse.pallas_conv import (MTILE, NCLASS, TILE,
                                              _pad128, _pick_mtile)


def stencil_shapes(arch_name: str):
    """(level, C, Cout) of every k=3 stencil conv in one forward."""
    a = ARCHS[arch_name]
    shapes = []
    inplanes = a.init_dim
    enc_out = [a.init_dim]
    for i in range(1, 5):  # encoder stages at levels 1..4
        c = inplanes
        for _ in range(a.layers[i - 1]):
            planes = a.planes[i - 1]
            if a.block == "basic":
                shapes.append((i, c, planes))
                shapes.append((i, planes, planes))
            else:
                shapes.append((i, planes, planes))  # conv2 only is k=3
            c = planes * a.expansion
        inplanes = c
        enc_out.append(c)
    for j, i in enumerate(range(4, 8)):  # decoder stages at levels 3..0
        lvl = 3 - j
        up_out = a.planes[i]
        c = up_out + enc_out[lvl]
        for _ in range(a.layers[i]):
            planes = a.planes[i]
            if a.block == "basic":
                shapes.append((lvl, c, planes))
                shapes.append((lvl, planes, planes))
            else:
                shapes.append((lvl, planes, planes))
            c = planes * a.expansion
    return shapes


def variants(arch_name: str, caps):
    fwd, bwd = Counter(), Counter()
    for lvl, C, Cout in stencil_shapes(arch_name):
        ntiles = caps[lvl] // TILE
        Coutp = _pad128(Cout)
        Cp = _pad128(C)
        K = 27
        if _pick_mtile(K, C, Coutp, backward=False) > 0:
            fwd[(K, C, Coutp, ntiles)] += 1
        else:
            fwd[(K // NCLASS, C, Coutp, ntiles)] += NCLASS
        if _pick_mtile(K, Cout, Cp, backward=True) > 0:
            bwd[(K, Cp, Cout, ntiles)] += 1
        else:
            bwd[(K // NCLASS, Cp, Cout, ntiles)] += NCLASS
    return fwd, bwd


def main():
    arch = sys.argv[1] if len(sys.argv) > 1 else "MinkUNet18A"
    if len(sys.argv) > 2:
        caps = tuple(int(c) for c in sys.argv[2:])
    else:  # bench-scale caps (8 synthetic scenes at 2cm)
        caps = (1115648, 507392, 136704, 28160, 7168)
    fwd, bwd = variants(arch, caps)
    print(f"{arch} caps={caps}")
    print(f"fwd Mosaic compiles: {len(fwd)} distinct "
          f"({sum(fwd.values())} call sites)")
    for key in sorted(fwd):
        K, C, Coutp, nt = key
        print(f"  fwd K={K:2d} C={C:3d} Coutp={Coutp:3d} ntiles={nt:5d} "
              f"x{fwd[key]}")
    print(f"bwd Mosaic compiles: {len(bwd)} distinct "
          f"({sum(bwd.values())} call sites)")
    for key in sorted(bwd):
        K, Cp, Cout, nt = key
        print(f"  bwd K={K:2d} Cp={Cp:3d} Cout={Cout:3d} ntiles={nt:5d} "
              f"x{bwd[key]}")
    print(f"total distinct Mosaic kernels: {len(fwd) + len(bwd)}")


if __name__ == "__main__":
    main()
