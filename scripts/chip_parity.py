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
TPU are different codegen contexts entirely — so bitwise equality is
only guaranteed WITHIN a backend.  Cross-backend, the meaningful
invariants are: the same link SET, the same ranking, and MI agreement at
f32 resolution.  Those are what this script asserts and records.

Legs run as subprocesses, strictly serialized (one TPU client at a
time; the child exits on its own — never killed, CLAUDE.md).

Usage:  python scripts/chip_parity.py [out.json]
"""

import json
import os
import subprocess
import sys
import tempfile

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
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "CHIP_PARITY_r05.json"
    )
    result = {"dataset": "snp_sample (400 genomes x 1268 SNPs, real fixture)"}
    with tempfile.TemporaryDirectory() as td:
        cpu_dir = os.path.join(td, "cpu")
        tpu_dir = os.path.join(td, "tpu")
        os.makedirs(cpu_dir)
        os.makedirs(tpu_dir)
        # strictly serial: the CPU child first (it must not race the TPU
        # child for the pool claim if JAX_PLATFORMS were mis-set)
        result["cpu_leg"] = run_leg("cpu", cpu_dir)
        result["tpu_leg"] = run_leg("tpu", tpu_dir)

        # ---- SR table: ranking + set + value agreement
        sr_c, key_c, mi_c, srp_c, ar_c = read_sr(
            os.path.join(cpu_dir, "sr_links.tsv")
        )
        sr_t, key_t, mi_t, srp_t, ar_t = read_sr(
            os.path.join(tpu_dir, "sr_links.tsv")
        )
        result["sr_rows_cpu"] = len(sr_c)
        result["sr_rows_tpu"] = len(sr_t)
        result["sr_pair_set_equal"] = sorted(key_c) == sorted(key_t)
        result["sr_ranking_equal"] = key_c == key_t  # srp-sorted order
        if sorted(key_c) == sorted(key_t):
            # align by pair key for value comparison
            idx_t = {k: i for i, k in enumerate(key_t)}
            perm = [idx_t[k] for k in key_c]
            result["sr_mi_max_abs_diff"] = float(
                np.abs(mi_c - mi_t[perm]).max()
            )
            result["sr_srp_max_abs_diff"] = float(
                np.abs(srp_c - srp_t[perm]).max()
            )
            result["sr_aracne_agree_frac"] = float(
                np.mean([ar_c[i] == ar_t[j] for i, j in enumerate(perm)])
            )
        result["sr_bytes_equal"] = open(
            os.path.join(cpu_dir, "sr_links.tsv")
        ).read() == open(os.path.join(tpu_dir, "sr_links.tsv")).read()

        # ---- LR table: set overlap (the retention threshold is a
        # quantile of f32 values, so an ulp of codegen difference can
        # flip rows AT the threshold; count them rather than hide them)
        lr_c, lrkey_c, lrmi_c = read_lr(os.path.join(cpu_dir, "lr_links.tsv"))
        lr_t, lrkey_t, lrmi_t = read_lr(os.path.join(tpu_dir, "lr_links.tsv"))
        set_c, set_t = set(lrkey_c), set(lrkey_t)
        common = set_c & set_t
        result["lr_rows_cpu"] = len(lr_c)
        result["lr_rows_tpu"] = len(lr_t)
        result["lr_common"] = len(common)
        result["lr_only_cpu"] = len(set_c - set_t)
        result["lr_only_tpu"] = len(set_t - set_c)
        result["lr_mi_max_abs_diff"] = float(
            max(
                (abs(lrmi_c[k] - lrmi_t[k]) for k in common),
                default=0.0,
            )
        )
        result["lr_bytes_equal"] = open(
            os.path.join(cpu_dir, "lr_links.tsv")
        ).read() == open(os.path.join(tpu_dir, "lr_links.tsv")).read()

    result["ok"] = bool(
        result["sr_pair_set_equal"]
        and result["sr_ranking_equal"]
        and result.get("sr_mi_max_abs_diff", 1.0) < 1e-6
        and result["lr_only_cpu"] + result["lr_only_tpu"]
        <= max(2, 0.001 * max(result["lr_rows_cpu"], 1))
        and result["lr_mi_max_abs_diff"] < 1e-6
    )
    with open(out_path, "wt") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
