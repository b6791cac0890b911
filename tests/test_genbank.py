"""GenBank parser tests: location grammar, qualifiers, ORIGIN."""

import numpy as np

from ldweaver_tpu.io.genbank import _parse_location, parse_genbank


def test_location_grammar():
    assert _parse_location("467..588") == (467, 588, 1, [(467, 588)])
    s, e, st, segs = _parse_location("complement(3300..4037)")
    assert (s, e, st) == (3300, 4037, -1)
    s, e, st, segs = _parse_location("join(12..78,134..202)")
    assert (s, e, st) == (12, 202, 1)
    assert segs == [(12, 78), (134, 202)]
    s, e, st, segs = _parse_location("complement(join(100..200,300..400))")
    assert (s, e, st) == (100, 400, -1)
    s, e, st, _ = _parse_location("<1..>206")
    assert (s, e, st) == (1, 206, 1)


def test_parse_genbank_roundtrip(tmp_path):
    gbk = tmp_path / "t.gbk"
    gbk.write_text(
        "LOCUS       TESTG            120 bp    DNA     circular BCT "
        "01-JAN-2024\n"
        "DEFINITION  test genome.\n"
        "VERSION     TESTG.1\n"
        "FEATURES             Location/Qualifiers\n"
        "     source          1..120\n"
        "     gene            10..39\n"
        '                     /gene="abc"\n'
        "     CDS             10..39\n"
        '                     /gene="abc"\n'
        '                     /locus_tag="T_0001"\n'
        '                     /product="a very long product name that\n'
        '                     wraps across lines"\n'
        "     CDS             complement(50..79)\n"
        '                     /locus_tag="T_0002"\n'
        "ORIGIN\n"
        "        1 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac"
        " gtacgtacgt\n"
        "       61 acgtacgtac gtacgtacgt acgtacgtac gtacgtacgt acgtacgtac"
        " gtacgtacgt\n"
        "//\n"
    )
    rec = parse_genbank(str(gbk))
    assert rec.name == "TESTG.1"
    assert rec.length == 120
    assert len(rec.sequence) == 120
    assert rec.sequence.startswith("ACGTACGT")
    cds = rec.cds
    assert len(cds) == 2
    assert cds[0].gene == "abc"
    assert cds[0].locus_tag == "T_0001"
    assert "wraps across lines" in cds[0].product
    assert cds[1].strand == -1
    starts, ends = rec.cds_ranges()
    assert starts.tolist() == [10, 50] and ends.tolist() == [39, 79]
