"""Shared pytest fixtures: one session-scoped local SparkSession."""

from __future__ import annotations

import pytest

from portuguese_pt_legal_ner_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    session = build_session(
        app_name="pt-legal-ner-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
