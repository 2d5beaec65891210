"""Run the runnable doc examples on the public surface (the reference's
tier-5 doctests, linalg/src/lib.rs:21-47, SURVEY §4.5)."""

import doctest

import sparsetpu


def test_package_doctest():
    results = doctest.testmod(sparsetpu, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures"
    assert results.attempted >= 5
