from __future__ import annotations

import pytest

from bangumi_notion_data_integration_project_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


def py_norm_p(z: float) -> float:
    """Python replay of stats.normal_p_two_sided — the A&S 7.1.26
    polynomial in the EXACT op sequence both engines evaluate (repeated
    multiplication, never pow: t**3 can differ from t*t*t by an ulp).
    One shared copy so the pinned sequence cannot drift between test
    files."""
    import math

    x = abs(z) / math.sqrt(2.0)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (
        0.254829592 * t
        - 0.284496736 * t * t
        + 1.421413741 * t * t * t
        - 1.453152027 * t * t * t * t
        + 1.061405429 * t * t * t * t * t
    )
    return poly * math.exp(-(x * x))
