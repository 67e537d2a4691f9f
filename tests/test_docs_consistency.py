"""Docs-consistency gate (VERDICT r3 item 7 / r4 item 2c): every headline
number README.md quotes must match the committed artifact it cites, within
a tolerance that absorbs round-to-round measurement noise but fails on the
class of drift rounds 3 and 4 kept finding (stale profiles cited as
current, accuracy rows from uncommitted runs, fps quotes older than the
bench artifact next to them).

Each check is (name, README regex with ONE float group, loader) where the
loader returns the artifact value from the LATEST committed round of that
artifact family. If the regex no longer matches, the README row was
reworded without updating this gate — that is also a failure, by design:
the gate only works while it actually covers the quoted numbers.

Reference analogue: none (the reference has no benchmark docs); this is
SURVEY.md section 6's "reproducible baseline" discipline applied to prose.
"""

from __future__ import annotations

import glob
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = open(os.path.join(REPO, "README.md")).read()

REL_TOL = 0.15


def _latest(pattern: str) -> dict:
    """Load the highest-round committed artifact of a family, unwrapping
    the driver's {"parsed": ...} envelope when present."""
    files = sorted(glob.glob(os.path.join(REPO, pattern)))
    assert files, f"no committed artifact matches {pattern}"
    with open(files[-1]) as f:
        doc = json.load(f)
    return doc.get("parsed", doc)


def _readme_float(regex: str) -> float:
    m = re.search(regex, README)
    assert m, f"README no longer matches /{regex}/ — update docs AND this gate"
    return float(m.group(1))


CHECKS = [
    (
        "throughput config frames/s",
        r"\*\*~([\d.]+) frames/s\*\* \(`BENCH_r\d+\.json:throughput_config_frames_per_s`",
        lambda: _latest("BENCH_r[0-9]*.json")["throughput_config_frames_per_s"],
    ),
    (
        "accuracy-config reprojection median (px)",
        r"\*\*median ([\d.]+) px\*\* \(`BENCH_r\d+\.json:reprojection_px_1024kp_upsampled_seeds`",
        lambda: _latest("BENCH_r[0-9]*.json")["reprojection_px_1024kp_upsampled"],
    ),
    (
        "throughput-config reprojection median (px)",
        r"median ([\d.]+) px \(`BENCH_r\d+\.json:reprojection_px_1024kp_seeds`",
        lambda: _latest("BENCH_r[0-9]*.json")["reprojection_px_1024kp"],
    ),
    (
        "ATE vs cv2 oracle median (% span)",
        r"median ([\d.]+), `BENCH_r\d+\.json:ate_vs_cv2_oracle_pct_span`",
        lambda: _latest("BENCH_r[0-9]*.json")["ate_vs_cv2_oracle_pct_span"],
    ),
    (
        "base detect ms",
        r"\*\*~([\d.]+) ms\*\* on-chip",
        lambda: _latest("DETECT_PROFILE_r[0-9]*.json")["full_ms"],
    ),
    (
        "accuracy detect ms",
        r"accuracy config ~([\d.]+) ms",
        lambda: _latest("DETECT_PROFILE_UP_r[0-9]*.json")["full_ms"],
    ),
    (
        "whole-trajectory global BA wall (s)",
        r"\*\*([\d.]+) s wall / [\d.]+ s on-chip execute\*\*",
        lambda: _latest("LONGRUN_r[0-9]*.json")["global_ba"]["wall_s"],
    ),
    (
        "whole-trajectory global BA execute (s)",
        r"\*\*[\d.]+ s wall / ([\d.]+) s on-chip execute\*\*",
        lambda: _latest("GLOBALBA_PROFILE_r[0-9]*.json")["execute_s"],
    ),
    (
        "500-frame ATE vs cv2 oracle after global BA (% span)",
        r"[\d.]+% -> \*\*([\d.]+)% of span\*\* \(`LONGRUN_r\d+\.json`",
        lambda: _latest("LONGRUN_r[0-9]*.json")["global_ba"][
            "ate_after_vs_cv2_oracle_pct_of_span"
        ],
    ),
    (
        "300-frame SYNTHGT ATE after global BA (% span)",
        r"\*\*([\d.]+)% of span\*\* \([\d.]+ before the whole-trajectory",
        lambda: _latest("SYNTHGT_r[0-9]*.json")["global_ba"]["ate_after_pct_of_span"],
    ),
    (
        "300-frame SYNTHGT steady frames/s",
        r"`SYNTHGT_r\d+\.json` — ([\d.]+) frames/s steady",
        lambda: _latest("SYNTHGT_r[0-9]*.json")["steady_frames_per_s"],
    ),
    (
        "1000-frame distributed global BA ATE after (% span)",
        r"2\.32% -> \*\*([\d.]+)% of span\*\* after 20 LM iterations \(`DISTBA1000_r\d+\.json`",
        lambda: _latest("DISTBA1000_r0[5-9]*.json")["ate_after_sharded_pct_of_span"],
    ),
    (
        "1000-frame distributed global BA parity gap",
        r"\*\*max rel cost gap ([\d.]+)e-9\*\*",
        lambda: _latest("DISTBA1000_r0[5-9]*.json")[
            "max_rel_cost_gap_vs_single_device"
        ]
        * 1e9,
    ),
    (
        "served vs live cold-start ratio",
        r"served cold\nstart is \*\*([\d.]+)x\*\* the live path",
        lambda: _latest("SERVE_r0[5-9]*.json")["served_vs_live_cold_ratio"],
    ),
    (
        "compile-cache hit first frame (s)",
        r"to\n\*\*([\d.]+) s\*\* \(hit\)",
        lambda: _latest("SERVE_r0[5-9]*.json")["E_cache_hit"]["first_frame_s"],
    ),
]


@pytest.mark.parametrize("name,regex,load", CHECKS, ids=[c[0] for c in CHECKS])
def test_readme_number_matches_artifact(name, regex, load):
    quoted = _readme_float(regex)
    measured = float(load())
    assert measured == pytest.approx(quoted, rel=REL_TOL), (
        f"README quotes {quoted} for '{name}' but the latest committed "
        f"artifact measures {measured} — refresh the README row (or "
        f"re-capture the artifact on HEAD)"
    )


def test_globalba_profile_not_stale():
    """The committed global-BA cost split must agree with the committed
    end-to-end wall it is cited to explain (VERDICT r4 Missing #2: the r04
    profile carried a pre-fix 277 s assembly under a 31.6 s wall claim)."""
    prof = _latest("GLOBALBA_PROFILE_r[0-9]*.json")
    longrun = _latest("LONGRUN_r[0-9]*.json")
    split_wall = prof["assembly_s"] + prof["first_call_s"]
    e2e_wall = longrun["global_ba"]["wall_s"]
    assert split_wall <= e2e_wall * 2.5, (
        f"profile split sums to {split_wall:.1f}s but LONGRUN measures the "
        f"same solve at {e2e_wall:.1f}s end-to-end — the profile artifact "
        "predates the code it claims to describe; re-capture it on HEAD"
    )
