"""CLI entry points (`python -m data_engineering_etl_demo_spark ...`) —
parity with the reference's runnable modules, driven in-process."""

import json

from data_engineering_etl_demo_spark.__main__ import main

def _fixture_inputs(tmp_path):
    events = tmp_path / "events.jsonl"
    lines = []
    for i in range(12):
        ev = ["pageview", "signup", "purchase"][i % 3]
        rec = {
            "event_id": f"e{i}",
            "ts": f"2026-01-{1 + i % 3:02d}T0{i % 10}:00:00Z",
            "user_id": str(i % 4),
            "event": ev,
        }
        if ev == "purchase":
            rec["amount"] = f"{i}.25"
        lines.append(json.dumps(rec))
    lines.append("not json at all")
    events.write_text("\n".join(lines) + "\n")
    users = tmp_path / "users.csv"
    users.write_text(
        "user_id,country,signup_source\n"
        + "\n".join(f"{i},C{i},src" for i in range(4))
        + "\n"
    )
    return str(events), str(users)


def test_cli_pipeline_then_analytics(spark, tmp_path, capsys):
    events, users = _fixture_inputs(tmp_path)
    wh, out = str(tmp_path / "wh"), str(tmp_path / "out")
    rc = main(
        [
            "pipeline",
            "--events",
            events,
            "--users",
            users,
            "--warehouse",
            wh,
            "--output",
            out,
        ],
        spark=spark,
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["ingest_good"] == 12
    assert report["ingest_bad"] == 1

    rc = main(
        ["analytics", "--warehouse", wh, "--output", str(tmp_path / "csv")],
        spark=spark,
    )
    assert rc == 0
    printed = capsys.readouterr().out
    for q in ("dau", "revenue", "event_counts", "funnel"):
        assert q in printed


def test_cli_query_and_list(spark, capsys):
    rc = main(["list"])
    assert rc == 0
    names = capsys.readouterr().out.split()
    assert "dau" in names and "docs_pagerank" in names

    rc = main(
        ["query", "nation_rollup", "--sf-dir", "/root/testdata/sf0.001"],
        spark=spark,
    )
    assert rc == 0
    assert "nation" in capsys.readouterr().out.lower()

    rc = main(["query", "no_such_query"], spark=spark)
    assert rc == 2


def test_cli_loader(spark, tmp_path, capsys):
    rc = main(
        ["loader", "--csv-dir", "tests/data", "--output", str(tmp_path / "o")],
        spark=spark,
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "files" in printed and "outputs" in printed
