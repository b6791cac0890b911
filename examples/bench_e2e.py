"""End-to-end 616-genome benchmark: the reference's own headline workload.

The LDWeaver README's only full-scale performance statement is for a
616-genome *S. pneumoniae* whole alignment (~2.2 Mb): "Possible runtime
> 1h" on a multicore workstation (/root/reference/README.md:123).  This
script reproduces that workload synthetically at full scale and runs the
COMPLETE pipeline — FASTA ingest (native gz scan), GenBank parse, CDS
diversity + painting, Hamming weights, the MI sweep + link extraction,
background model, ARACNE, annotation, tophits, and plots — and prints one
JSON line with the total wall clock and the per-block split
(timings.json).

    python examples/bench_e2e.py [out_dir]

Env knobs:
  E2E_NSEQ  (616)        number of genomes
  E2E_G     (2200000)    genome length (bp)
  E2E_NSNP  (131072)     SNP sites planted (post-filter count is ~equal)
  E2E_SMOKE=1            tiny CPU-sized shapes to validate the harness
  E2E_BACKEND (spmd)     sweep backend (spmd | fast | jax)

Dataset realism: biallelic-skewed MAF in [0.02, 0.5], ~15% of sites carry
N calls, gap runs, and a CDS annotation covering ~85% of the genome —
matching the synthetic profile bench.py uses so sweep numbers are
comparable.
"""

import gzip
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # runnable without PYTHONPATH
    sys.path.insert(0, _REPO)

SMOKE = os.environ.get("E2E_SMOKE") == "1"
if SMOKE:
    # force the CPU backend before the axon PJRT plugin can claim the
    # relay'd chip (config API needed; env var alone is overridden)
    import jax

    jax.config.update("jax_platforms", "cpu")

NSEQ = int(os.environ.get("E2E_NSEQ", 24 if SMOKE else 616))
G = int(os.environ.get("E2E_G", 100_000 if SMOKE else 2_200_000))
# smoke spans SEVERAL blocks at the config clamp floor max_blk_sz=1000
# (ADVICE r2: a 512 smoke block was silently reset to 10000 and the run
# never tiled)
NSNP = int(os.environ.get("E2E_NSNP", 2500 if SMOKE else 131_072))
BACKEND = os.environ.get("E2E_BACKEND", "spmd")


def _write_gbk(path, name, seq, cds_list):
    """Minimal well-formed GenBank flat file (same shape as the test
    fixture's writer; duplicated here so importing it cannot trigger the
    test conftest's force-CPU side effects on a TPU run)."""
    g = len(seq)
    with open(path, "wt") as fh:
        fh.write(
            f"LOCUS       {name}             {g} bp    DNA     circular"
            " BCT 01-JAN-2024\n"
        )
        fh.write("DEFINITION  synthetic benchmark genome.\n")
        fh.write(f"VERSION     {name}\n")
        fh.write("FEATURES             Location/Qualifiers\n")
        fh.write(f"     source          1..{g}\n")
        for k, (s, e, strand) in enumerate(cds_list):
            loc = f"{s}..{e}" if strand > 0 else f"complement({s}..{e})"
            fh.write(f"     gene            {loc}\n")
            fh.write(f'                     /gene="g{k:04d}"\n')
            fh.write(f"     CDS             {loc}\n")
            fh.write(f'                     /gene="g{k:04d}"\n')
            fh.write(f'                     /locus_tag="SYN_{k:05d}"\n')
            fh.write(
                f'                     /product="hypothetical protein {k}"\n'
            )
        fh.write("ORIGIN\n")
        for i in range(0, g, 60):
            chunk = seq[i : i + 60]
            groups = " ".join(
                chunk[j : j + 10] for j in range(0, len(chunk), 10)
            )
            fh.write(f"{i + 1:>9} {groups.lower()}\n")
        fh.write("//\n")


def synth_alignment(out_fa, out_gbk, nseq, g, nsnp, seed=0):
    """Write a full nseq x g alignment (.fa.gz) + a GenBank annotation.

    Non-SNP columns are identical across sequences (pass-1 drops them);
    planted SNP columns draw a minor allele at per-site MAF so they pass
    the default filters (io/fasta.py:filter_sites)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    ref = bases[rng.integers(0, 4, size=g)]
    snp_pos = np.sort(rng.choice(g, size=nsnp, replace=False))  # 0-based
    major = ref[snp_pos]
    minor_off = rng.integers(1, 4, size=nsnp)
    minor = bases[(np.searchsorted(bases, major) + minor_off) % 4]
    maf = rng.uniform(0.02, 0.5, size=nsnp)
    n_sites = rng.random(nsnp) < 0.15  # sites that carry N calls

    t0 = time.time()
    with gzip.open(out_fa, "wb", compresslevel=1) as fh:
        row = np.empty(g, np.uint8)
        for s in range(nseq):
            row[:] = ref
            take_minor = rng.random(nsnp) < maf
            col = np.where(take_minor, minor, major)
            ncalls = (rng.random(nsnp) < 0.03) & n_sites
            col = np.where(ncalls, np.uint8(ord("N")), col)
            row[snp_pos] = col
            fh.write(b">seq%d\n" % s)
            fh.write(row.tobytes())
            fh.write(b"\n")
    gen_s = time.time() - t0

    # CDS features tiling ~85% of the genome (typical bacterial density)
    cds = []
    p = 150
    while p + 3000 < g:
        ln = int(rng.integers(200, 500)) * 3
        strand = 1 if rng.random() < 0.7 else -1
        cds.append((p, p + ln - 1, strand))
        p += ln + int(rng.integers(30, 250))
    seq_str = ref.tobytes().decode()
    _write_gbk(out_gbk, "SYNPNEUMO.1", seq_str, cds)
    return gen_s, os.path.getsize(out_fa)


def main(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    fa = os.path.join(out_dir, "aln.fa.gz")
    gbk = os.path.join(out_dir, "ref.gbk")
    # regenerate unless BOTH artifacts exist (ADVICE r2: an interrupted
    # generation left aln.fa.gz without ref.gbk and the rerun crashed)
    if not (os.path.exists(fa) and os.path.exists(gbk)):
        print(f"generating {NSEQ} x {G} bp alignment ...", flush=True)
        gen_s, fa_bytes = synth_alignment(fa, gbk, NSEQ, G, NSNP)
        print(f"  wrote {fa_bytes/1e6:.0f} MB gz in {gen_s:.0f} s", flush=True)

    from ldweaver_tpu import LDWeaverConfig, ldweaver

    cfg = LDWeaverConfig(
        # reference default: annotate (no java in this image -> the
        # built-in codon-aware annotator runs); all 12 blocks execute
        SnpEff_Annotate=True,
        max_blk_sz=1000 if SMOKE else 4096,  # 1000 = the config clamp floor
        lr_retain_links=1_000_000,
        save_additional_outputs=False,
    )
    dset = os.path.join(out_dir, "ldw_out")
    if os.path.exists(dset):
        # a stale dset would resume from caches and time a RESUME, not a
        # full run (ADVICE r2) — a benchmark must start clean
        import shutil

        print(f"removing stale {dset} (benchmark runs must be full runs)")
        shutil.rmtree(dset)
    t0 = time.time()
    sr = ldweaver(dset=dset, aln_path=fa, gbk_path=gbk, config=cfg,
                  backend=BACKEND)
    total = time.time() - t0
    timings = json.load(open(os.path.join(dset, "timings.json")))
    # cleanup (BLK12) moves the raw link TSVs into Temp/ (reference
    # folder layout, R/BacGWES.R cleanup)
    sr_tsv = os.path.join(dset, "Temp", "sr_links.tsv")
    if not os.path.exists(sr_tsv):
        sr_tsv = os.path.join(dset, "sr_links.tsv")
    nsnp_used = sum(1 for _ in open(sr_tsv))
    result = {
        "metric": "e2e_616_genome_wall_s",
        "value": round(total, 1),
        "unit": "s",
        "reference_claim_s": 3600,  # README.md:123 "> 1h"
        "detail": {
            "nseq": NSEQ, "g": G, "nsnp_planted": NSNP,
            "backend": BACKEND, "sr_links": int(len(sr)),
            "sr_rows": nsnp_used, "blocks": timings,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ldw_e2e")
