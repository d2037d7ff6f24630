"""Native C++ instance parser: builds, parses, and agrees with the Python
fallback on generated .tsp/.vrp files."""

import numpy as np
import pytest

from greyjack_tpu.native import native_available, parse_instance


TSP_TEXT = """NAME : toy5
TYPE : TSP
DIMENSION : 5
EDGE_WEIGHT_TYPE : EUC_2D
NODE_COORD_SECTION
1 0.0 0.0
2 1.5 0.0
3 1.5 2.5
4 0.0 2.5
5 0.75 1.25
EOF
"""

VRP_TEXT = """NAME : toy-tw-d1-n4-k2
TYPE : CVRP
DIMENSION : 5
EDGE_WEIGHT_TYPE : EUC_2D
CAPACITY : 30
NODE_COORD_SECTION
1 0.0 0.0
2 1.0 0.0
3 2.0 0.0
4 0.0 1.0
5 0.0 2.0
DEMAND_SECTION
1 0 0 1000 0
2 10 5 100 7
3 12 0 50 3
4 8 10 90 2
5 9 0 80 1
DEPOT_SECTION
1
-1
EOF
"""


@pytest.fixture(scope="module")
def lib_ok():
    if not native_available():
        pytest.skip("native toolchain unavailable")
    return True


def test_parse_tsp(tmp_path, lib_ok):
    p = tmp_path / "toy.tsp"
    p.write_text(TSP_TEXT)
    r = parse_instance(str(p))
    assert r["name"] == "toy5"
    assert r["edge_weight_type"] == "EUC_2D"
    np.testing.assert_array_equal(r["ids"], [1, 2, 3, 4, 5])
    np.testing.assert_array_equal(r["xs"], [0.0, 1.5, 1.5, 0.0, 0.75])
    np.testing.assert_array_equal(r["ys"], [0.0, 0.0, 2.5, 2.5, 1.25])


def test_parse_vrp_matches_python(tmp_path, lib_ok):
    p = tmp_path / "toy.vrp"
    p.write_text(VRP_TEXT)
    from greyjack_tpu.models.vrp.domain import read_vrp_file

    domain = read_vrp_file(str(p))  # native path
    assert domain.time_windowed
    assert len(domain.vehicles) == 2
    assert domain.vehicles[0].capacity == 30
    assert len(domain.depot_vec) == 1
    assert [c.demand for c in domain.customers_vec] == [0, 10, 12, 8, 9]
    assert domain.customers_vec[1].time_window_start == 5
    assert domain.customers_vec[1].service_time == 7
    assert domain.vehicles[0].work_day_end == 1000  # depot window

    # native metadata parse: vehicles from -kNN suffix
    r = parse_instance(str(p))
    assert r["vehicles_count"] == 2
    assert r["capacity"] == 30
    np.testing.assert_array_equal(r["depot_ids"], [1])


def test_tsp_domain_via_file(tmp_path, lib_ok):
    p = tmp_path / "toy.tsp"
    p.write_text(TSP_TEXT)
    from greyjack_tpu.models.tsp import DomainBuilder

    domain = DomainBuilder(str(p)).build_domain_from_scratch()
    assert len(domain.locations_vec) == 5
    dm = np.asarray(domain.distance_matrix)
    assert dm.shape == (5, 5)
    assert dm[0, 1] == 1.5
