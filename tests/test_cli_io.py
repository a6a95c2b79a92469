"""CLI subcommands + artifact IO round trips (reference src/ binaries,
file IO tested across rank counts as in test_psac.cpp:306-347)."""

import numpy as np
import pytest

from psac_tpu.ops.alphabet import rand_dna


def run_cli(argv):
    from psac_tpu.cli import main
    return main(argv)


def test_psac_check_write_read(tmp_path, mesh8, mesh1):
    text = rand_dna(2000, seed=4)
    f = tmp_path / "in.txt"
    f.write_bytes(text)
    pre = str(tmp_path / "out")
    assert run_cli(["psac", "-f", str(f), "-l", "-c", "-o", pre]) == 0

    from psac_tpu.io import read_suffix_array
    from psac_tpu.models.suffix_array import build_suffix_array
    res = read_suffix_array(pre)
    # reload matches a rebuild on a *different* mesh size (rank-count
    # independence, reference test_psac.cpp:333-343)
    res1 = build_suffix_array(text, mesh=mesh1)
    np.testing.assert_array_equal(res.sa, res1.sa)
    np.testing.assert_array_equal(res.lcp, res1.lcp)
    assert res.alphabet.sigma == 4


def test_print64_mkpattern(tmp_path, capsys):
    text = rand_dna(500, seed=1)
    f = tmp_path / "t.txt"
    f.write_bytes(text)
    pat = tmp_path / "p.txt"
    assert run_cli(["mkpattern", "-f", str(f), "-n", "5", "-l", "8",
                    "-o", str(pat)]) == 0
    lines = pat.read_bytes().strip().split(b"\n")
    assert len(lines) == 5 and all(len(x) == 8 for x in lines)
    assert all(x in text for x in lines)

    from psac_tpu.io import write_u64
    write_u64(str(tmp_path / "v.u64"), np.array([3, 1, 2**40]))
    assert run_cli(["print64", str(tmp_path / "v.u64")]) == 0
    out = capsys.readouterr().out.strip().split("\n")
    assert out == ["3", "1", str(2**40)]


def test_gsac_cli(tmp_path):
    f = tmp_path / "ss.txt"
    f.write_bytes(b"banana\nana\nnab\nbanana\n")
    assert run_cli(["gsac", "-f", str(f), "-c"]) == 0


def test_desa_cli_save_load_query(tmp_path):
    text = rand_dna(3000, seed=8)
    f = tmp_path / "t.txt"
    f.write_bytes(text)
    pat = tmp_path / "p.txt"
    run_cli(["mkpattern", "-f", str(f), "-n", "16", "-l", "12", "-o", str(pat)])
    pre = str(tmp_path / "idx")
    assert run_cli(["desa", "-f", str(f), "-o", pre, "-q", str(pat),
                    "--reps", "1"]) == 0
    # reload and verify results match a fresh build
    from psac_tpu.models.desa import build_desa, read_desa
    from psac_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    patterns = [x for x in pat.read_bytes().split(b"\n") if x]
    fresh = build_desa(text, mesh=mesh).bulk_locate(patterns)
    loaded = read_desa(text, pre, mesh=mesh).bulk_locate(patterns)
    np.testing.assert_array_equal(fresh, loaded)


def test_kmer_stats_and_dss(tmp_path, capsys):
    text = rand_dna(4000, seed=2)
    f = tmp_path / "t.txt"
    f.write_bytes(text)
    assert run_cli(["kmer-stats", "-f", str(f), "-t", "8", "-p", "4"]) == 0
    assert "imbalance=" in capsys.readouterr().out
    assert run_cli(["dss", "-f", str(f), "-l"]) == 0
