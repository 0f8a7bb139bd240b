#!/usr/bin/env python3
"""Cartesian K* correlation plot from paired -dump tracks.

Equivalent of scripts/cartesian_plot/cartesian_plot.R: takes the
"count<tab>k1<tab>k2" aggregation produced by simplify_dump.py (NA where
a k-mer is missing from one read set) and renders the reference's figure
the matplotlib way: a count-weighted 2D-binned density of K1* vs K2*
(1000 bins, blue->red gradient, log color scale) with missing k-mers
overlaid as open diamonds sized by their count.

Usage: cartesian_plot.py <paired.tsv[.gz]> [out_prefix]
Writes <out_prefix>.png (default: correlation_Kstar.png).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merfin_tpu.io.compressed import open_read_text  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        sys.stderr.write(__doc__)
        return 1
    out = sys.argv[2] if len(sys.argv) > 2 else "correlation_Kstar"

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from matplotlib.colors import LinearSegmentedColormap, LogNorm

    counts, k1, k2 = [], [], []
    m_counts, m_k1, m_k2 = [], [], []
    with open_read_text(sys.argv[1]) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 3:
                continue
            c = float(parts[0])
            missing = "NA" in (parts[1], parts[2])
            a = 0.0 if parts[1] == "NA" else float(parts[1])
            b = 0.0 if parts[2] == "NA" else float(parts[2])
            if missing:
                # missing k-mers appear ONLY as the diamond overlay (the
                # R reference's density layer drops NA rows)
                m_counts.append(c)
                m_k1.append(a)
                m_k2.append(b)
                continue
            counts.append(c)
            k1.append(a)
            k2.append(b)
    if not counts and not m_counts:
        sys.stderr.write("no rows parsed\n")
        return 1

    # the reference's gradient: low #21409A -> high #ED1C24
    cmap = LinearSegmentedColormap.from_list("merfin", ["#21409A", "#ED1C24"])
    fig, ax = plt.subplots(figsize=(10, 10))
    h = ax.hist2d(k1, k2, bins=1000, weights=counts, cmap=cmap,
                  norm=LogNorm(), cmin=1)
    if m_counts:
        sizes = 10 + 200 * np.asarray(m_counts) / max(m_counts)
        ax.scatter(m_k1, m_k2, s=sizes, marker="D", facecolors="none",
                   edgecolors="black", linewidths=1.2, label="missing")
        ax.legend(loc="upper left", frameon=False)
    ax.set_xlabel("K1*")
    ax.set_ylabel("K2*")
    fig.colorbar(h[3], ax=ax, label="k-mer count")
    fig.tight_layout()
    fig.savefig(out + ".png", dpi=150)
    sys.stderr.write(f"wrote {out}.png\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
