"""Real-TUM readiness hook (VERDICT r2 item 7 / missing #1).

Real TUM RGB-D data is unreachable from this container (zero egress), so
the headline fr1/desk + fr2/xyz ATE table cannot be filled here. These
tests keep the path ready-to-fire:

  - the harness (tools/tum_headline.py run_table) is exercised end-to-end
    in CI against the synthetic TUM-format fixture — same index parsing,
    associate pairing, CLI pipeline, groundtruth ATE/RPE evaluation a real
    sequence would use;
  - the real-data test un-skips the moment PHOVO_TUM_DIR points at a real
    sequence directory:

        PHOVO_TUM_DIR=/data/rgbd_dataset_freiburg1_desk \
            python -m pytest tests/test_real_tum.py -q

    (and `python -m tools.tum_headline` fills the full per-preset table —
    one command from "dataset directory appears" to "headline table".)
"""

import os

import pytest

# fixture reuse: a synthetic TUM-format directory with groundtruth.txt
from tests.test_tum_pipeline import INTR, N_FRAMES, tum_dir  # noqa: F401

_FIXTURE_INTR = "{},{},{},{}".format(
    float(INTR.fx), float(INTR.fy), float(INTR.cx), float(INTR.cy)
)


def test_headline_harness_on_synthetic_fixture(tum_dir, tmp_path):  # noqa: F811
    """The one-command real-TUM path, verified on the TUM-format fixture:
    run_table must produce a finished row (CLI exit 0, ATE/RPE parsed)."""
    from tools.tum_headline import run_table

    rows = run_table(
        tum_dir,
        presets=[("config_4_level_optimization_analytic", "analytic")],
        intrinsics=_FIXTURE_INTR,
        chunk=2,
        out_json=str(tmp_path / "headline.json"),
        out_md=str(tmp_path / "headline.md"),
        quiet=True,
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["exit"] == 0, r
    # sanity, not accuracy: the preset's blur/iteration schedule is tuned
    # for VGA and the fixture is 96x128, so a centimetre-scale ATE is
    # expected — the test pins that the PATH works (a broken pipeline
    # produces tens of centimetres or a failed row)
    assert r["ate_rmse_m"] < 0.05, r
    assert r["ate_pairs"] == N_FRAMES - 1
    assert (tmp_path / "headline.md").read_text().count("|") > 10
    assert (tmp_path / "headline.json").is_file()


def test_headline_harness_rejects_incomplete_dir(tmp_path):
    from tools.tum_headline import run_table

    with pytest.raises(FileNotFoundError):
        run_table(tmp_path, presets=[("x", "analytic")], quiet=True)


@pytest.mark.skipif(
    not os.environ.get("PHOVO_TUM_DIR"),
    reason="set PHOVO_TUM_DIR to a real TUM RGB-D sequence directory "
    "(rgb.txt/depth.txt/groundtruth.txt) to run the headline check",
)
def test_headline_on_real_tum_sequence(tmp_path):
    """Fires on real data the moment it exists: the production preset must
    track a real fr1-style sequence within the blueprint's coarse sanity
    bound (the full per-preset table comes from tools/tum_headline CLI)."""
    from tools.tum_headline import run_table

    rows = run_table(
        os.environ["PHOVO_TUM_DIR"],
        presets=[("config_5_level_optimization_analytic", "analytic")],
        intrinsics=os.environ.get("PHOVO_TUM_INTRINSICS", "fr1"),
        chunk=16,
        max_frames=int(os.environ.get("PHOVO_TUM_MAX_FRAMES", "300")),
        out_json=str(tmp_path / "headline.json"),
        out_md=str(tmp_path / "headline.md"),
        quiet=True,
    )
    r = rows[0]
    assert r["exit"] == 0, r
    # coarse sanity bound for a few-hundred-frame fr1 segment; the
    # reference's own accuracy on fr1/desk is ~a few cm ATE over short
    # segments — a tracking failure shows up as tens of centimetres
    assert r["ate_rmse_m"] < 0.25, r
