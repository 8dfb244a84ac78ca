import os
import shutil
import tempfile

import pytest

from fuel_spark.cli import main


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="fuel_spark_cli_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_convert_csv_and_info(spark, outdir, capsys):
    csv = os.path.join(outdir, "in.csv")
    with open(csv, "w") as f:
        f.write("k,lang,v\n")
        for i in range(20):
            f.write(f"{i},{'en' if i % 2 else 'fr'},{i * 1.5}\n")
    out = os.path.join(outdir, "ds")
    assert main(["convert", "--input", csv, "--format", "csv", "--header",
                 "--output", out, "--partition-by", "lang"]) == 0
    assert os.path.isdir(os.path.join(out, "lang=en"))
    back = spark.read.parquet(out)
    assert back.count() == 20
    captured = capsys.readouterr().out
    assert "20 rows" in captured

    assert main(["info", out]) == 0
    captured = capsys.readouterr().out
    assert "rows=20" in captured


def test_cli_profile(capsys):
    from fuel_spark.cli import main

    rc = main(["profile", "/root/testdata/sf0.001/region.parquet"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "r_regionkey" in out and "distinct=5" in out
    assert "mean=2.0" in out  # keys 0..4


def test_cli_compact_and_zorder(spark, outdir, capsys):
    from fuel_spark.cli import main
    from fuel_spark.sources import from_rows

    src = os.path.join(outdir, "frag")
    from_rows(
        spark,
        [(i, float(i % 97), float(i % 53)) for i in range(2000)],
        schema="k bigint, u double, v double",
    ).repartition(16).write.parquet(src)

    comp = os.path.join(outdir, "comp")
    assert main(["compact", "--input", src, "--output", comp]) == 0
    assert "1 files" in capsys.readouterr().out
    assert spark.read.parquet(comp).count() == 2000

    zout = os.path.join(outdir, "z")
    assert main(["zorder", "--input", src, "--output", zout,
                 "--by", "u", "v", "--files", "4"]) == 0
    assert "zorder by u, v" in capsys.readouterr().out
    assert spark.read.parquet(zout).count() == 2000


def test_cli_dedup_command(spark, tmp_path):
    """End-to-end: dedup a small parquet corpus through the CLI."""
    from fuel_spark.cli import main
    from fuel_spark.sources import from_rows

    base = "the quick brown fox jumps over the lazy dog again and again"
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    from_rows(
        spark,
        [(1, base), (2, base), (3, "entirely different content here")],
        schema="doc_id bigint, text string",
    ).write.mode("overwrite").parquet(src)
    rc = main([
        "dedup", "--input", src, "--output", out, "--threshold", "0.5",
    ])
    assert rc == 0
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [1, 3]


def test_cli_substrdedup_command(spark, tmp_path, capsys):
    """End-to-end: ExactSubstr-clean a parquet corpus through the CLI."""
    from fuel_spark.cli import main
    from fuel_spark.sources import from_rows

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    src = str(tmp_path / "sin")
    out = str(tmp_path / "sout")
    from_rows(
        spark,
        [
            (1, "intro " + shared + " tail"),
            (2, "other start " + shared + " other end"),
            (3, "totally unique words in this one only here"),
        ],
        schema="doc_id bigint, text string",
    ).write.mode("overwrite").parquet(src)
    rc = main(["substrdedup", "--input", src, "--output", out])
    assert rc == 0
    assert "cut 10 duplicated words from 1 docs" in capsys.readouterr().out
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert rows[1].n_words_removed == 0          # first occurrence kept
    assert rows[2].n_words_removed == 10
    assert shared not in rows[2].text_clean
    assert rows[3].n_words_removed == 0
