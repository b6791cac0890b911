"""On-chip output parity: the real TPU's sr/lr link tables vs the CPU
oracle (VERDICT r4 next-#2).

All 178+ parity tests run on the CPU backend; this script closes the
gap to BASELINE.json's north star ("exact link-table ranking equality",
reference oracle pattern /root/reference/tests/testthat/test-pipeline.R:
32-59) as far as one real chip allows: it runs the production
`perform_mi_computation(backend="spmd")` on BOTH backends over the real
400-genome snp_sample fixture and compares the TSVs.

Caveat (parallel/spmd_sweep.py module docstring): XLA's elementwise
codegen is fusion-context dependent at the f32 ulp level, and CPU and
TPU are different codegen contexts entirely — different transcendental
(log) implementations whose last-ulp differences AMPLIFY through the MI
epilogue's telescoped log cancellations to ~1e-4 absolute on O(0.1..1)
MI values (measured).  Bitwise equality is guaranteed only WITHIN a
backend (tests/test_spmd_sweep.py proves it across drivers and mesh
sizes).  Cross-backend, the meaningful invariants are: near-total link
SET agreement (a boundary fringe at the retention/cutoff thresholds is
expected and COUNTED, not hidden), identical top-ranked links, and MI
agreement at the amplified-f32 resolution.  Those are what this script
asserts and records.

Legs run as subprocesses, strictly serialized (one TPU client at a
time; the child exits on its own — never killed, CLAUDE.md).  Leg
outputs persist under --workdir; an existing leg's TSVs are reused, so
the comparison can be re-run without re-claiming the chip.

Usage:  python scripts/chip_parity.py [out.json]
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOY_ALN = "/root/reference/inst/extdata/snp_sample.fa.gz"
TOY_POS = "/root/reference/inst/extdata/snp_sample.pos"


def run_leg(platform: str, outdir: str) -> dict:
    """One backend leg in a fresh child process."""
    code = f"""
import json, os, time
import numpy as np
if {platform!r} == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
from ldweaver_tpu.io.fasta import parse_fasta_snp_alignment
from ldweaver_tpu.core.cds import CdsVar, Clusters
from ldweaver_tpu.core.sweep import perform_mi_computation

pos = np.loadtxt({TOY_POS!r}, dtype=np.int64)
sd = parse_fasta_snp_alignment({TOY_ALN!r}, pos)
sd.g = 50000
from ldweaver_tpu.core.hamming import hamming_weights_numpy
hdw = hamming_weights_numpy(sd.codes, 0.1)
rng = np.random.default_rng(7)
nclust = 3
paint = rng.integers(1, nclust + 1, size=sd.nsnp).astype(np.int64)
cds_var = CdsVar(
    var_estimate=np.zeros(1), cds_start=np.zeros(1, np.int64),
    cds_end=np.zeros(1, np.int64), clusts=Clusters(np.array([1]), 0.0),
    paint=paint, ref=np.array(["A"] * sd.nsnp),
    alt=np.array([""] * sd.nsnp), allele_table=sd.acgtn_table,
    nclust=nclust,
)
t0 = time.time()
links = perform_mi_computation(
    sd, hdw, cds_var,
    lr_save_path=os.path.join({outdir!r}, "lr_links.tsv"),
    sr_save_path=os.path.join({outdir!r}, "sr_links.tsv"),
    plt_folder=None, sr_dist=2000, lr_retain_links=20000.0,
    max_blk_sz=1024, srp_cutoff=3.0, backend="spmd", verbose=False,
)
import jax
print(json.dumps(dict(
    platform=jax.devices()[0].platform, wall_s=round(time.time() - t0, 2),
    sr_rows=int(len(links)),
)))
"""
    env = os.environ.copy()
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, cwd=REPO,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{platform} leg failed:\n{proc.stderr[-2000:]}"
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def read_sr(path):
    """sr_links.tsv: clust_c pos1 pos2 clust1 clust2 len MI srp ARACNE."""
    rows = [ln.rstrip("\n").split("\t") for ln in open(path)]
    key = [(r[1], r[2]) for r in rows]
    mi = np.array([float(r[6]) for r in rows])
    srp = np.array([float(r[7]) for r in rows])
    ar = [r[8] for r in rows]
    return rows, key, mi, srp, ar


def read_lr(path):
    rows = [ln.rstrip("\n").split("\t") for ln in open(path)]
    key = [(r[0], r[1]) for r in rows]
    mi = {k: float(r[5]) for k, r in zip(key, rows)}
    return rows, key, mi


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = args[0] if args else os.path.join(
        REPO, "CHIP_PARITY_r05.json"
    )
    workdir = "/tmp/chip_parity_runs"
    result = {
        "dataset": "snp_sample (400 genomes x 1268 SNPs, real fixture)",
        "semantics": (
            "in-backend TSVs are bitwise-reproducible (tests); across"
            " CPU/TPU the f32 log-epilogue differs at amplified-ulp"
            " scale, so parity = link-set/ranking agreement with a"
            " counted threshold-boundary fringe"
        ),
    }
    cpu_dir = os.path.join(workdir, "cpu")
    tpu_dir = os.path.join(workdir, "tpu")
    tpu2_dir = os.path.join(workdir, "tpu2")  # on-chip repeat
    for plat, d in (
        ("cpu", cpu_dir), ("tpu", tpu_dir), ("tpu", tpu2_dir)
    ):
        # strictly serial: one TPU client at a time; reuse existing legs
        tag = os.path.basename(d) + "_leg"
        if os.path.exists(os.path.join(d, "sr_links.tsv")):
            result[tag] = json.load(open(os.path.join(d, "leg.json")))
            continue
        os.makedirs(d, exist_ok=True)
        result[tag] = run_leg(plat, d)
        with open(os.path.join(d, "leg.json"), "wt") as fh:
            json.dump(result[tag], fh)

    # in-backend bitwise reproducibility ON THE CHIP (the CPU-side
    # guarantee is already test-suite-proven): two independent TPU
    # processes must emit byte-identical TSVs
    result["tpu_repeat_sr_bytes_equal"] = open(
        os.path.join(tpu_dir, "sr_links.tsv")
    ).read() == open(os.path.join(tpu2_dir, "sr_links.tsv")).read()
    result["tpu_repeat_lr_bytes_equal"] = open(
        os.path.join(tpu_dir, "lr_links.tsv")
    ).read() == open(os.path.join(tpu2_dir, "lr_links.tsv")).read()

    # ---- SR table: set + ranking + value agreement over shared pairs
    sr_c, key_c, mi_c, srp_c, ar_c = read_sr(
        os.path.join(cpu_dir, "sr_links.tsv")
    )
    sr_t, key_t, mi_t, srp_t, ar_t = read_sr(
        os.path.join(tpu_dir, "sr_links.tsv")
    )
    set_c, set_t = set(key_c), set(key_t)
    shared = set_c & set_t
    result["sr_rows_cpu"] = len(sr_c)
    result["sr_rows_tpu"] = len(sr_t)
    result["sr_shared"] = len(shared)
    result["sr_only_cpu"] = len(set_c - set_t)  # srp_cutoff boundary
    result["sr_only_tpu"] = len(set_t - set_c)  # fringe, counted
    idx_c = {k: i for i, k in enumerate(key_c)}
    idx_t = {k: i for i, k in enumerate(key_t)}
    pc = [idx_c[k] for k in shared]
    pt = [idx_t[k] for k in shared]
    result["sr_mi_max_abs_diff"] = float(np.abs(mi_c[pc] - mi_t[pt]).max())
    result["sr_srp_max_abs_diff"] = float(
        np.abs(srp_c[pc] - srp_t[pt]).max()
    )
    result["sr_aracne_agree_frac"] = round(
        float(np.mean([ar_c[i] == ar_t[j] for i, j in zip(pc, pt)])), 5
    )
    # the table is srp-sorted: the TOP of the ranking is the scientific
    # output (tophits); the fringe lives at the cutoff tail.  Order
    # within ~1e-3 srp near-ties legitimately swaps across backends
    # (measured: first swap at rank 40 between srp 5.7961 / 5.7944), so
    # the strong invariants are top-10 ORDER and top-100 SET.
    result["sr_top10_rank_equal"] = key_c[:10] == key_t[:10]
    result["sr_top100_set_equal"] = set(key_c[:100]) == set(key_t[:100])

    # ---- LR table: set overlap (the retention threshold is a quantile
    # of f32 values, so amplified-ulp differences flip rows AT the
    # threshold; count them rather than hide them)
    lr_c, lrkey_c, lrmi_c = read_lr(os.path.join(cpu_dir, "lr_links.tsv"))
    lr_t, lrkey_t, lrmi_t = read_lr(os.path.join(tpu_dir, "lr_links.tsv"))
    lset_c, lset_t = set(lrkey_c), set(lrkey_t)
    common = lset_c & lset_t
    result["lr_rows_cpu"] = len(lr_c)
    result["lr_rows_tpu"] = len(lr_t)
    result["lr_common"] = len(common)
    result["lr_only_cpu"] = len(lset_c - lset_t)
    result["lr_only_tpu"] = len(lset_t - lset_c)
    result["lr_mi_max_abs_diff"] = float(
        max((abs(lrmi_c[k] - lrmi_t[k]) for k in common), default=0.0)
    )

    nsr = max(result["sr_rows_cpu"], 1)
    nlr = max(result["lr_rows_cpu"], 1)
    result["ok"] = bool(
        result["tpu_repeat_sr_bytes_equal"]
        and result["tpu_repeat_lr_bytes_equal"]
        and result["sr_top10_rank_equal"]
        and result["sr_top100_set_equal"]
        and result["sr_only_cpu"] + result["sr_only_tpu"] <= 0.01 * nsr
        and result["sr_mi_max_abs_diff"] < 5e-4
        and result["sr_aracne_agree_frac"] >= 0.99
        and result["lr_only_cpu"] + result["lr_only_tpu"] <= 0.002 * nlr
        and result["lr_mi_max_abs_diff"] < 5e-4
    )
    with open(out_path, "wt") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
