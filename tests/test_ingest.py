"""Ingest tests: FASTA parsing + SNP filter semantics vs hand-computed
counts on the bundled toy data (SURVEY.md section 7 step 1)."""

import gzip

import numpy as np
import pytest

from ldweaver_tpu.io.fasta import (
    extract_codes,
    filter_sites,
    iter_fasta,
    parse_fasta_alignment,
    parse_fasta_snp_alignment,
    scan_alignment,
)
from tests.conftest import TOY_ALN, TOY_POS


def test_iter_fasta_toy():
    recs = list(iter_fasta(TOY_ALN))
    assert len(recs) == 400
    name, seq = recs[0]
    assert name.startswith("ERR")
    assert len(seq) == 1268


def test_scan_counts_match_bruteforce():
    nseq, L, names, counts = scan_alignment(TOY_ALN)
    assert nseq == 400 and L == 1268
    # brute force on a handful of columns
    with gzip.open(TOY_ALN, "rt") as fh:
        seqs = []
        cur = []
        for line in fh:
            if line.startswith(">"):
                if cur:
                    seqs.append("".join(cur))
                cur = []
            else:
                cur.append(line.strip())
        seqs.append("".join(cur))
    for j in [0, 5, 100, 1267]:
        col = [s[j] for s in seqs]
        for k, alleles in enumerate(["Aa", "Cc", "Gg", "Tt"]):
            assert counts[k, j] == sum(c in alleles for c in col)
        assert counts[4, j] == sum(c not in "AaCcGgTt" for c in col)
    assert (counts.sum(axis=0) == nseq).all()


def test_filter_default_semantics():
    # site with alleles A:380, C:16, other:4 -> second largest 16 > 4 keep
    counts = np.array([[380], [16], [0], [0], [4]])
    assert filter_sites(counts, 400, "default").size == 1
    # second largest == min_maf (4) is NOT kept (strict >)
    counts = np.array([[392], [4], [0], [0], [4]])
    assert filter_sites(counts, 400, "default").size == 0
    # monomorphic dropped
    counts = np.array([[396], [0], [0], [0], [4]])
    assert filter_sites(counts, 400, "default").size == 0
    # gap-heavy dropped: gap freq 0.15 not < 0.15
    counts = np.array([[200], [140], [0], [0], [60]])
    assert filter_sites(counts, 400, "default").size == 0


def test_filter_relaxed_semantics():
    # A:0.85, C:0.0095, N:0.1405 (SURVEY / R/BacGWES.R:16-17 example):
    # dropped by default, allowed by relaxed
    counts = np.array([[340], [4], [0], [0], [56]])
    assert filter_sites(counts, 400, "default").size == 0
    assert filter_sites(counts, 400, "relaxed").size == 1
    # max count > n*(1-maf) dropped by relaxed
    counts = np.array([[397], [2], [0], [0], [1]])
    assert filter_sites(counts, 400, "relaxed").size == 0


def test_parse_snp_alignment_toy(toy_snp_data):
    sd = toy_snp_data
    assert sd.nseq == 400
    # the toy SNP alignment re-filters: retained count <= 1268
    assert 0 < sd.nsnp <= 1268
    # genome positions come from the pos file
    pos_file = np.loadtxt(TOY_POS, dtype=np.int64)
    assert np.isin(sd.pos, pos_file).all()
    assert np.all(np.diff(sd.pos) > 0)
    # r = number of distinct alleles, between 2 and 5 for SNPs
    assert sd.r.min() >= 2 and sd.r.max() <= 5
    # acgtn table column sums = nseq
    assert (sd.acgtn_table.sum(axis=0) == 400).all()
    # uqe consistent with acgtn_table
    assert np.array_equal(sd.uqe, (sd.acgtn_table > 0).astype(np.uint8).T)


def test_snpdata_roundtrip(tmp_path, toy_snp_data):
    from ldweaver_tpu.core.snp_tensor import SnpData

    p = str(tmp_path / "snp.npz")
    toy_snp_data.save_npz(p)
    sd2 = SnpData.load_npz(p)
    assert np.array_equal(sd2.codes, toy_snp_data.codes)
    assert np.array_equal(sd2.pos, toy_snp_data.pos)
    assert sd2.g == toy_snp_data.g
    assert sd2.seq_names == toy_snp_data.seq_names


def test_native_and_python_parsers_agree(tmp_path):
    """Fuzz: wrapped lines, CRLF, mixed case, gaps - native C++ tokenizer
    vs the pure-Python path must agree exactly."""
    rng = np.random.default_rng(77)
    nseq, L = 23, 402
    alphabet = np.array(list("ACGTacgtNn-xX"))
    seqs = alphabet[rng.integers(0, alphabet.size, size=(nseq, L))]
    path = str(tmp_path / "fuzz.fa")
    with open(path, "wt", newline="") as fh:
        for i in range(nseq):
            fh.write(f">seq{i} extra description\r\n")
            s = "".join(seqs[i])
            width = int(rng.integers(37, 91))
            for j in range(0, L, width):
                fh.write(s[j : j + width] + ("\r\n" if i % 2 else "\n"))
    n1, l1, names1, c1 = scan_alignment(path, use_native=True)
    n2, l2, names2, c2 = scan_alignment(path, use_native=False)
    assert (n1, l1) == (n2, l2) == (nseq, L)
    assert names1 == names2
    assert np.array_equal(c1, c2)
    pos = np.arange(1, L + 1, 7)
    codes1, t1, _ = extract_codes(path, pos, nseq, use_native=True)
    codes2, t2, _ = extract_codes(path, pos, nseq, use_native=False)
    assert np.array_equal(codes1, codes2)
    assert np.array_equal(t1, t2)
