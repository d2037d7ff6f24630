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


def test_rabbitmq_broker_fake_pika(monkeypatch):
    """Exercise the RabbitMqBroker adapter against an in-memory fake pika
    module (pika is not installed here): task submit/consume and solution
    publish mirror the reference's queue/exchange contract
    (`vrp_service/src/main.rs:30-105`,
    `observers/rabbitmq_observer.rs:31-57`)."""
    import sys
    import types

    queues = {}
    published = []

    class FakeChannel:
        def basic_publish(self, exchange, routing_key, body):
            if exchange == "":
                queues.setdefault(routing_key, []).append(body)
            else:
                published.append((exchange, routing_key, body))

        def basic_get(self, queue, auto_ack=False):
            pending = queues.get(queue, [])
            if pending:
                return ("method", None, pending.pop(0))
            return (None, None, None)

    class FakeConnection:
        def __init__(self, params):
            self.params = params
            self.closed = False

        def channel(self):
            return FakeChannel()

        def close(self):
            self.closed = True

    fake_pika = types.ModuleType("pika")
    fake_pika.BlockingConnection = FakeConnection
    fake_pika.ConnectionParameters = (
        lambda host, port: {"host": host, "port": port})
    monkeypatch.setitem(sys.modules, "pika", fake_pika)

    from greyjack_tpu.service.brokers import RabbitMqBroker

    broker = RabbitMqBroker("localhost")
    assert broker.next_task() is None  # empty queue -> None, no raise

    broker.submit_task({"job": 1, "payload": [1, 2, 3]})
    got = broker.next_task()
    assert got == {"job": 1, "payload": [1, 2, 3]}
    assert broker.next_task() is None  # auto_ack drained it

    broker.publish_solution({"score": [0, 1.5]})
    assert published == [
        ("vrp_solutions_exchange", "vrp_out", json.dumps({"score": [0, 1.5]}))
    ]
    broker.close()
    assert broker.connection.closed


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
