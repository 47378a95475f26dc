"""Line sources (plain/gz/bz2/tar) and the CLI surface."""

import bz2
import gzip
import subprocess
import sys
import tarfile

import pytest

SSH_LOG = "/root/reference/example/loghub_OpenSSH/SSH_2k.log"


@pytest.fixture()
def sample_files(tmp_path):
    lines = ["Jan  1 12:00:00 h1 app[1]: started",
             "Jan  1 12:00:01 h2 app[2]: stopped"]
    plain = tmp_path / "a.log"
    plain.write_text("\n".join(lines) + "\n")
    gz = tmp_path / "b.log.gz"
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(lines) + "\n")
    bz = tmp_path / "c.log.bz2"
    with bz2.open(bz, "wt") as f:
        f.write("\n".join(lines) + "\n")
    tar = tmp_path / "d.tar.gz"
    with tarfile.open(tar, "w:gz") as t:
        t.add(plain, arcname="inner/a.log")
    return plain, gz, bz, tar, lines


def test_read_lines_all_formats(ray_session, sample_files):
    from log2seq_ray.sources.lines import read_lines
    plain, gz, bz, tar, lines = sample_files
    ds = read_lines([str(plain), str(gz), str(bz), str(tar)])
    rows = ds.take_all()
    texts = [r["text"] for r in rows]
    assert texts.count(lines[0]) == 4  # one per source format
    tar_rows = [r for r in rows if "::" in r["path"]]
    assert tar_rows and tar_rows[0]["path"].endswith("::inner/a.log")


def run_cli(*args, stdin=None):
    return subprocess.run(
        [sys.executable, "-m", "log2seq_ray", *args],
        capture_output=True, text=True, input=stdin, cwd="/root/repo")


def test_cli_words_output():
    r = run_cli("-p", "openssh", SSH_LOG, "-t", "words", "--max-failures", "0")
    assert r.returncode == 0
    assert "# processed 2000 lines: 2000 ok, 0 failed" in r.stderr
    first = r.stdout.splitlines()[0]
    assert first.startswith("reverse mapping checking")


def test_cli_stdin_and_exit_codes():
    r = run_cli("-t", "words", stdin="Jan  1 12:00:00 host hello world\n")
    assert r.returncode == 0
    assert r.stdout.strip() == "hello world"
    r = run_cli(stdin="@@@ unparseable @@@\n")
    assert r.returncode == 1
    assert "parse failed" in r.stderr


def test_cli_statement_mode():
    r = run_cli("-s", "-t", "words", stdin="a (b:c) d\n")
    assert r.returncode == 0
    assert r.stdout.strip() == "a b c d"


def test_cli_parquet_output(tmp_path):
    out = tmp_path / "out.parquet"
    r = run_cli("-p", "openssh", SSH_LOG, "-o", str(out))
    assert r.returncode == 0
    import pyarrow.parquet as pq
    tbl = pq.read_table(out)
    assert tbl.num_rows == 2000
    assert "words" in tbl.column_names


def test_cli_max_failures_cap():
    bad = "\n".join(["@@@ bad"] * 10) + "\nJan  1 12:00:00 host ok ok\n"
    r = run_cli("--max-failures", "2", stdin=bad)
    assert r.returncode == 0
    assert r.stderr.count("parse failed") == 2
    assert "further failures suppressed" in r.stderr
