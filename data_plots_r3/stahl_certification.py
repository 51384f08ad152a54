"""Figure: PSIS certification of the real-data Stahl fits.

Left: ECDF of per-participant khat by condition — where each curve
crosses the 0.7 line IS the certified fraction. Right: the headline
proportion-of-cognitive-variance per condition, raw amortized vs
PSIS-debiased (mean over participants +/- SE), showing the reference's
speed > base > fake ordering survives debiasing.
"""
import json

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

CONDS = [("base_invert", "base"), ("speed_invert", "speed"),
         ("accuracy_invert", "accuracy"), ("base_fake", "fake covariate")]
# Okabe-Ito (colorblind-safe, fixed assignment); identity also carried by
# direct labels and marker shape, never color alone
COLORS = ["#0072B2", "#E69F00", "#009E73", "#CC79A7"]

fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.2), tight_layout=True)

for (stem, label), c in zip(CONDS, COLORS):
    z = np.load(f"results/stahl_psis_{stem}_r3.npz")
    khat = np.sort(np.minimum(z["khat"], 2.0))       # inf -> clipped at 2
    ecdf = np.arange(1, len(khat) + 1) / len(khat)
    cert = float((z["khat"] < 0.7).mean())
    ax1.step(khat, ecdf, where="post", color=c, lw=2,
             label=f"{label} — {cert:.0%} certified")
ax1.axvline(0.7, color="#888888", lw=1, ls="--")
ax1.text(0.71, 0.04, "certification threshold\n(khat = 0.7)", fontsize=8,
         color="#555555")
ax1.set_xlabel("PSIS khat (per participant; clipped at 2)")
ax1.set_ylabel("fraction of participants")
ax1.set_title("Certification of amortized fits on real data")
ax1.set_xlim(0, 2.15)
ax1.set_ylim(0, 1.02)
ax1.legend(loc="lower right", frameon=False, fontsize=9)
ax1.spines[["top", "right"]].set_visible(False)

for k, ((stem, label), c) in enumerate(zip(CONDS, COLORS)):
    r = json.load(open(f"results/stahl_psis_{stem}_r3.json"))
    raw = np.array(r["psis"]["prop_cog_var_raw_mean"], float)
    deb = np.array(r["psis"]["prop_cog_var_debiased_mean"], float)
    fin = np.isfinite(deb)
    n = fin.sum()
    rm, rs = raw[fin].mean(), raw[fin].std(ddof=1) / np.sqrt(n)
    dm, ds = deb[fin].mean(), deb[fin].std(ddof=1) / np.sqrt(n)
    ax2.plot([k - 0.12, k + 0.12], [rm, dm], color=c, lw=1.5, zorder=2)
    ax2.errorbar([k - 0.12], [rm], yerr=[rs], color=c, marker="o",
                 mfc="white", ms=7, capsize=3, zorder=3)
    ax2.errorbar([k + 0.12], [dm], yerr=[ds], color=c, marker="o",
                 ms=7, capsize=3, zorder=3)
ax2.set_xticks(range(len(CONDS)), [l for _, l in CONDS])
ax2.set_ylabel(r"prop. cognitive variance  $\sigma_\alpha^2/(\sigma_\alpha^2+\sigma_1^2)$")
ax2.set_title("Headline quantity: raw (open) vs PSIS-debiased (filled)")
ax2.spines[["top", "right"]].set_visible(False)
ax2.set_ylim(bottom=0)

fig.savefig("data_plots_r3/stahl_certification.png", dpi=150)
print("wrote data_plots_r3/stahl_certification.png")
