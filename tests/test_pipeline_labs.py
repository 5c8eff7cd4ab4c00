"""End-to-end labs pipeline test on reference-shaped fixtures
(FIXTURES.md §2/§11)."""

from __future__ import annotations

from pids_drg_esoa_spark.pipelines.base import PipelineContext, get_pipeline
from pids_drg_esoa_spark.pipelines.labs import prepare_labs


def _fixtures(spark):
    esoa = spark.createDataFrame(
        [
            ("101", "LaboratoryAndDiagnostic", "CBC; Platelet Count (auto)"),
            ("102", "LaboratoryAndDiagnostic", "URINALYSIS"),
            ("103", "LaboratoryAndDiagnostic", "Chest X-Ray PA"),
            ("104", "LaboratoryAndDiagnostic", "totally unknown assay"),
            ("105", "DrugsAndMedicine", "PARACETAMOL 500MG TAB"),  # wrong category
            ("1600", "LaboratoryAndDiagnostic", "EXCLUDED BAND ITEM"),  # range filter
            ("106", "LaboratoryAndDiagnostic", None),  # null desc
            ("102", "LaboratoryAndDiagnostic", "URINALYSIS"),  # dup
        ],
        "ITEM_NUMBER string, ITEM_REF_CODE string, DESCRIPTION string",
    )
    master = spark.createDataFrame(
        [
            ("L1", "CBC Platelet Count auto", "Y"),
            ("L2", "Urinalysis", "Y"),
        ],
        "ITEM_NUMBER string, DESCRIPTION string, IS_OFFICIAL string",
    )
    diagnostics = spark.createDataFrame(
        [("D9", "chest x ray PA", "rad", "spec", "", "")],
        "code string, desc string, cat string, spec string, etc string, misc string",
    )
    return esoa, master, diagnostics


def test_prepare_filters(spark):
    esoa, *_ = _fixtures(spark)
    prepared = prepare_labs(esoa)
    items = {r.ITEM_NUMBER for r in prepared.collect()}
    assert items == {"101", "102", "103", "104"}


def test_labs_pipeline_end_to_end(spark):
    esoa, master, diagnostics = _fixtures(spark)
    pipe = get_pipeline("LaboratoryAndDiagnostic")
    ctx = PipelineContext(
        spark=spark,
        inputs={"esoa": esoa, "labs_master": master, "diagnostics": diagnostics},
    )
    timings: dict[str, float] = {}
    pipe.run(ctx, timing_hook=lambda name, sec: timings.setdefault(name, sec))

    out = {r.ITEM_NUMBER: r for r in ctx.artifacts["esoa_matched_labs"].collect()}
    assert out["101"].match_source == "labs_master"  # punctuation-insensitive exact
    assert out["101"].matched_description == "CBC Platelet Count auto"
    assert out["102"].match_source == "labs_master"
    assert out["103"].match_source == "diagnostics"  # fallback catalog
    # full diagnostics passthrough + the reference's coalesced
    # standard_description (input description when unmatched)
    assert out["103"].diag_cat == "rad" and out["103"].diag_spec == "spec"
    assert out["103"].standard_description == "chest x ray PA"
    unmatched = [r for r in out.values() if r.match_source == "unmatched"]
    assert all(r.standard_description == r.DESCRIPTION for r in unmatched)
    assert out["104"].match_source == "unmatched"

    m = ctx.artifacts["metrics"].collect()[0]
    assert (m.n_total, m.n_master, m.n_diag, m.n_unmatched) == (4, 2, 1, 1)
    assert set(timings) == {"pre_run", "prepare_inputs", "match", "post_run"}


def test_labs_pipeline_with_xlsx_diagnostics(spark, tmp_path):
    """S3 end-to-end in the labs flow: the diagnostics dim arrives as
    a real .xlsx workbook (match_labs.py:55 reads it with
    pd.read_excel(dtype=str)), decoded by the stdlib codec, and the
    fallback tier matches through it identically; the report sink
    round-trips through the same codec (S7, match_labs.py:116-123)."""
    from pids_drg_esoa_spark.sources.readers import read_excel_df
    from pids_drg_esoa_spark.sources.writers import write_excel_report
    from pids_drg_esoa_spark.sources.xlsx import read_xlsx, write_xlsx

    esoa, master, _ = _fixtures(spark)
    xlsx_path = str(tmp_path / "diagnostics.xlsx")
    write_xlsx(
        xlsx_path,
        ["code", "desc", "cat", "spec", "etc", "misc"],
        [("D9", "chest x ray PA", "rad", "spec", None, None)],
    )
    diagnostics = read_excel_df(spark, xlsx_path)

    pipe = get_pipeline("LaboratoryAndDiagnostic")
    ctx = PipelineContext(
        spark=spark,
        inputs={"esoa": esoa, "labs_master": master, "diagnostics": diagnostics},
    )
    pipe.run(ctx)
    out = {r.ITEM_NUMBER: r for r in ctx.artifacts["esoa_matched_labs"].collect()}
    assert out["103"].match_source == "diagnostics"

    report = str(tmp_path / "matched.xlsx")
    assert write_excel_report(ctx.artifacts["esoa_matched_labs"], report, sheet="matched")
    header, rows = read_xlsx(report)
    assert "match_source" in header and len(rows) == 4


def test_prepare_range_excludes_float_and_scientific_ids(spark):
    """r10 labs-fuzz find: the reference's range mask is
    pd.to_numeric(errors='coerce') — FLOAT semantics — so '1540.0',
    '1540.5' and '1.6e3' (=1600) are numeric and excluded, while
    '1,540' / '1540x' fail the parse and are kept. A long cast NULLed
    the float shapes and kept them."""
    esoa = spark.createDataFrame(
        [(i, "LaboratoryAndDiagnostic", f"desc {i}") for i in
         ["1539", "1540", "1896", "1897", "1540.0", "1540.5", "1.6e3",
          " 1540 ", "1,540", "-1540", "0001540", "LAB-77"]],
        "ITEM_NUMBER string, ITEM_REF_CODE string, DESCRIPTION string",
    )
    kept = {r.ITEM_NUMBER for r in prepare_labs(esoa).collect()}
    assert kept == {"1539", "1897", "1,540", "-1540", "LAB-77"}


def test_master_first_wins_is_file_row_order(spark):
    """r10 labs-fuzz find: the reference's lookup keeps the first FILE
    ROW per normalized key (dict setdefault) — with _row_order present
    the engine matches that; the min-item-number survivor is only the
    no-order fallback."""
    from pids_drg_esoa_spark.pipelines.labs import match_labs

    esoa = spark.createDataFrame(
        [("1", "LaboratoryAndDiagnostic", "LIPID - PANEL")],
        "ITEM_NUMBER string, ITEM_REF_CODE string, DESCRIPTION string",
    )
    master = spark.createDataFrame(
        [
            # file order: L9 first (wins), L1 second despite min key
            (0, "L9", "Lipid Panel", "N"),
            (1, "L1", "LIPID/PANEL", "Y"),
        ],
        "_row_order long, ITEM_NUMBER string, DESCRIPTION string, IS_OFFICIAL string",
    )
    diagnostics = spark.createDataFrame(
        [], "code string, desc string, cat string, spec string, etc string, misc string"
    )
    out = match_labs(prepare_labs(esoa), master, diagnostics).collect()[0]
    assert out.master_item_number == "L9"
    assert out.standard_description == "Lipid Panel"

    # no _row_order column → deterministic min-key fallback
    out2 = match_labs(
        prepare_labs(esoa), master.drop("_row_order"), diagnostics
    ).collect()[0]
    assert out2.master_item_number == "L1"


def test_read_csv_maps_pandas_na_sentinels(spark, tmp_path):
    """r10 labs-fuzz find: every reference CSV enters through
    pd.read_csv, whose default na_values turns the literal strings
    'nan'/'NA'/'NULL'/... into missing; the engine's S1 scan now does
    the same."""
    from pids_drg_esoa_spark.sources.readers import read_csv

    p = tmp_path / "t.csv"
    p.write_text("a,b\nnan,1\nNULL,2\nN/A,3\nkeep,4\nnanx,5\n")
    rows = {r.b: r.a for r in read_csv(spark, str(p)).collect()}
    assert rows == {"1": None, "2": None, "3": None, "4": "keep", "5": "nanx"}
