"""JVM-side function expressions (fields + textstats) behave per the
reference semantics, and the spark-submit CLI job runs end-to-end."""

import json
import os
import subprocess
import sys

from pyspark.sql import functions as F

from document_text_extraction_spark.functions import (
    datelike_col,
    emails_col,
    lang_id_col,
    phones_col,
    skill_tokens_col,
    skills_col,
    token_count_col,
)


def test_pii_scrub_order_contract(spark):
    """email → ip → phone application order: the dotted quad must not
    survive as a partial phone match, and an email's digits must not be
    consumed by the phone pass."""
    from document_text_extraction_spark.functions.fields import pii_scrub_col
    df = spark.createDataFrame(
        [("mail 5551234567a@b.co from 10.0.42.7 call +1 (555) 123-4567 end",)],
        ["text"])
    out = df.select(pii_scrub_col(F.col("text")).alias("s")).first().s
    assert out == "mail <EMAIL> from <IP> call <PHONE> end"


def test_field_expressions(spark):
    df = spark.createDataFrame(
        [("mail a@b.co and c@d.org call +1 (555) 123-4567 "
          "skills: spark, sql",)], ["text"])
    r = df.select(
        emails_col(F.col("text")).alias("emails"),
        phones_col(F.col("text")).alias("phones"),
        skills_col(F.col("text")).alias("skills"),
    ).first()
    assert r["emails"] == ["a@b.co", "c@d.org"]
    assert "+15551234567" in r["phones"]
    assert set(r["skills"]) >= {"spark", "sql"}


def test_address_heuristic(spark):
    """O55: keyword line wins, email/phone/keyword parts dropped, first
    keyword line wins even when empty, no keyword → '' — and the JVM
    expression agrees with the pure-Python oracle on every case."""
    from document_text_extraction_spark.functions.fields import address_col
    from document_text_extraction_spark.oracle import extract_address
    cases = [
        "Jo Doe\nContact details: a@b.co, +1 555 123, 12 Oak St, Springfield",
        "Address: 99 River Rd, Hilltown\nbody text",
        "Contact details: a@b.co, +1 555\nAddress: 5 Elm Ave, Dover",
        "no keyword anywhere\njust text",
        "line\n" * 10 + "Address: 1 Late St",  # keyword beyond line 10
        "ADDRESS: 7 Shout Ln, Yelltown",       # case-insensitive
    ]
    # note: the reference drops only 'contact'-keyword parts, so an
    # 'Address:' prefix stays glued to its street part — replicated
    # faithfully (approach4_v2.py:77-84)
    expected = ["12 Oak St, Springfield", "Address: 99 River Rd, Hilltown",
                "", "", "", "ADDRESS: 7 Shout Ln, Yelltown"]
    assert [extract_address(t) for t in cases] == expected
    df = spark.createDataFrame([(t,) for t in cases], ["text"])
    got = [r["a"] for r in
           df.select(address_col(F.col("text")).alias("a")).collect()]
    assert got == expected


def test_skill_tokens_and_datelike(spark):
    df = spark.createDataFrame(
        [("python, apache spark | k8s; a", "born 1990 in May",)],
        ["skills", "bio"])
    r = df.select(
        skill_tokens_col(F.col("skills")).alias("toks"),
        datelike_col(F.col("bio")).alias("datelike"),
        datelike_col(F.col("skills")).alias("not_datelike"),
    ).first()
    assert r["toks"] == ["Python", "Apache Spark", "K8s"]  # 'a' dropped
    assert r["datelike"] is True and r["not_datelike"] is False


def test_lang_id_on_real_phrases(spark):
    df = spark.createDataFrame(
        [(0, "the cat is in the house and it is warm"),
         (1, "el perro es de la casa y que es grande"),
         (2, "der hund ist nicht das problem und zu gross"),
         (3, "zzz qqq xxx")], ["i", "text"])
    got = {r["i"]: r["lang"] for r in df.select(
        "i", lang_id_col(F.col("text")).alias("lang")).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "und"}


def test_token_count(spark):
    df = spark.createDataFrame([("a b c",), ("one",)], ["text"])
    got = [r[0] for r in
           df.select(token_count_col(F.col("text"))).collect()]
    assert got == [3, 1]


def test_run_extract_cli(tmp_path):
    """Drive the production CLI end-to-end in a subprocess."""
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    p = subprocess.run(
        [sys.executable, "jobs/run_extract.py", "--synth", "200",
         "--output", out_dir, "--buckets", "8", "--slice-buckets", "4"],
        capture_output=True, text=True, timeout=420, env=env,
        cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr[-2000:]
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    assert summary["docs"] == 200
    assert summary["slices_committed"] == 2
    assert summary["parse_failures"] == 10  # 5% junk route
    assert os.path.isdir(os.path.join(out_dir, "data"))


def test_cv_field_regexes(spark):
    from document_text_extraction_spark.functions import (
        degrees_col, experience_years_col, gpa_col)
    df = spark.createDataFrame(
        [("Bachelor of Science at X, GPA: 3.85, 12+ years of experience "
          "then Master of Engineering",),
         ("no cv content here",)], ["text"])
    rows = df.select(
        gpa_col(F.col("text")).alias("gpa"),
        degrees_col(F.col("text")).alias("degrees"),
        experience_years_col(F.col("text")).alias("exp"),
    ).collect()
    assert rows[0]["gpa"] == "3.85"
    assert rows[0]["degrees"] == ["Bachelor of Science",
                                  "Master of Engineering"]
    assert rows[0]["exp"] == 12
    assert rows[1]["gpa"] == "" and rows[1]["exp"] == -1


def test_registrable_domain_branches(spark):
    """Every branch of the PLD rule: two-level suffix (case + trailing
    dot), plain domain, deep subdomain, IPv4, single label, suffix
    sibling collapse."""
    from document_text_extraction_spark.functions.urls import (
        registrable_domain_col,
    )
    cases = {
        "www.BBC.co.uk.": "bbc.co.uk",
        "news.bbc.co.uk": "bbc.co.uk",
        "a.b.example.com": "example.com",
        "example.com": "example.com",
        "1.2.3.4.": "1.2.3.4",
        "localhost": "localhost",
        "x.com.au": "x.com.au",
        "static.x.com.au": "x.com.au",
        "site00.example.org": "example.org",
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {r.host: r.pld for r in df.select(
        "host", registrable_domain_col(F.col("host")).alias("pld")
    ).collect()}
    assert got == cases
