"""Service-layer tests: JSON round-trip, observer streaming, HTTP broker."""

import json
import threading
import urllib.request

from greyjack_tpu.models.vrp import generate_instance
from greyjack_tpu.service import SolverService, InProcessBroker, HttpBroker
from greyjack_tpu.service.solver_service import (
    JsonDomainBuilder,
    domain_to_task_json,
)
from greyjack_tpu.agents import TabuSearch
from greyjack_tpu.agents.termination_strategies import StepsLimit
from greyjack_tpu.solver import SolverLoggingLevels


def _agent():
    return TabuSearch(16, 0.2, True, None, [0.5, 0.5, 0.0, 0.0, 0.0, 0.0],
                      5, StepsLimit(15))


def test_json_domain_roundtrip():
    domain = generate_instance(15, 2, 4, seed=3, time_windowed=True)
    task = domain_to_task_json(domain)
    rebuilt = JsonDomainBuilder(task).build_domain_from_scratch()
    assert len(rebuilt.customers_vec) == len(domain.customers_vec)
    assert len(rebuilt.vehicles) == len(domain.vehicles)
    assert rebuilt.time_windowed
    assert rebuilt.vehicles[0].capacity == domain.vehicles[0].capacity
    import numpy as np

    np.testing.assert_array_equal(
        np.asarray(rebuilt.distance_matrix), np.asarray(domain.distance_matrix)
    )


def test_service_streams_solutions():
    broker = InProcessBroker()
    domain = generate_instance(12, 1, 3, seed=8)
    broker.submit_task(domain_to_task_json(domain))
    service = SolverService(broker, _agent, n_jobs=2,
                            logging_level=SolverLoggingLevels.Silent, seed=5)
    final = service.serve_one(timeout=1)
    assert final is not None
    streamed = []
    while True:
        s = broker.next_solution(timeout=0.1)
        if s is None:
            break
        streamed.append(s)
    assert streamed[-1] == "Solving finished"
    assert len(streamed) >= 2  # at least one improvement + the marker
    assert "sum_travel_distance" in streamed[0]


def test_http_broker():
    broker = HttpBroker(port=0)
    try:
        domain = generate_instance(10, 1, 3, seed=2)
        task = domain_to_task_json(domain)
        req = urllib.request.Request(
            f"http://127.0.0.1:{broker.port}/tasks",
            data=json.dumps(task).encode(),
            method="POST",
        )
        assert urllib.request.urlopen(req).status == 202
        got = broker.next_task(timeout=2)
        assert got["metadata"]["vehicles_count"] == 3

        broker.publish_solution({"hello": "world"})
        resp = urllib.request.urlopen(
            f"http://127.0.0.1:{broker.port}/solutions", timeout=5
        )
        assert json.loads(resp.read()) == {"hello": "world"}
    finally:
        broker.close()
