"""CLI analysis subcommands (quantiles / topk / top-terms) over a real
table. cli.main respects the pytest session's Ray."""

import json

import duckdb
import ray.data

from engine import cli
from engine.jobs import ingest
from engine.manifest import Table
from engine.pages import synth_pages_table


def _mk_table(root) -> str:
    t = Table.create(str(root / "tbl"))
    ingest(t, ray.data.from_arrow(synth_pages_table(300)), sanitize_cols=())
    return str(root / "tbl")


def test_cli_quantiles_and_grouped(tmp_path, ray_session, capsys):
    path = _mk_table(tmp_path)
    assert cli.main(["quantiles", "--table", path, "--column", "warc_ts",
                     "--q", "0.5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "q_0.5" in out
    assert cli.main(["quantiles", "--table", path, "--column", "warc_ts",
                     "--q", "0.5", "--by", "lang"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and all("q_0.5" in r for r in rows)
    # oracle: per-lang discrete median over the same table
    df = Table.load(path).scan(columns=["lang", "warc_ts"]).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    want = dict(
        con.execute(
            "SELECT lang, quantile_disc(warc_ts, 0.5) FROM t GROUP BY lang"
        ).fetchall()
    )
    got = {r["lang"]: r["q_0.5"] for r in rows}
    # the CLI JSON stringifies timestamps (default=str): compare values
    # through the same rendering, not just the key set
    assert got == {k: str(v) for k, v in want.items()}


def test_cli_topk_global_and_grouped(tmp_path, ray_session, capsys):
    path = _mk_table(tmp_path)
    assert cli.main(["topk", "--table", path, "--order", "warc_ts",
                     "--k", "3", "--tie", "url"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == 3
    assert cli.main(["topk", "--table", path, "--order", "warc_ts",
                     "--k", "2", "--by", "lang", "--tie", "url"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    langs = {r["lang"] for r in rows}
    assert len(rows) <= 2 * len(langs) and len(langs) > 1


def test_cli_top_terms(tmp_path, ray_session, capsys):
    path = _mk_table(tmp_path)
    assert cli.main(["top-terms", "--table", path, "--k", "2"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and all({"lang", "term", "n"} <= set(r) for r in rows)
