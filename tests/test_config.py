"""Config/enum/validation tests (reference: src/Common/Configuration.cpp,
src/Arguments.hpp)."""

import pytest

from partitionedhashjoin_tpu.config import (
    Configuration,
    JoinAlgorithmType,
    OutputConfiguration,
    OutputType,
    ResultsFormat,
    ResultsFormatConfiguration,
    validate_parsed_configuration,
)


def test_join_type_strings():
    assert (
        JoinAlgorithmType.from_string("no-partitioning")
        is JoinAlgorithmType.NO_PARTITIONING
    )
    assert (
        JoinAlgorithmType.from_string("radix-partitioning")
        is JoinAlgorithmType.RADIX_PARTITIONING
    )
    assert str(JoinAlgorithmType.NO_PARTITIONING) == "no-partitioning"
    with pytest.raises(ValueError):
        JoinAlgorithmType.from_string("bogus")


def test_results_type_tags():
    assert JoinAlgorithmType.NO_PARTITIONING.results_type_tag == "NoPartitioning"
    assert (
        JoinAlgorithmType.RADIX_PARTITIONING.results_type_tag == "RadixPartitioning"
    )


def test_results_format_and_output_type():
    assert ResultsFormat.from_string("json") is ResultsFormat.JSON
    assert OutputType.from_string("file") is OutputType.FILE
    with pytest.raises(ValueError):
        ResultsFormat.from_string("xml")


def test_output_configuration_validation():
    cfg = OutputConfiguration()
    cfg.file.name = ""
    with pytest.raises(ValueError):
        cfg.validate()


def test_time_unit_validation():
    cfg = ResultsFormatConfiguration(time_unit="fortnights")
    with pytest.raises(ValueError):
        cfg.validate()
    for unit in ("ns", "us", "ms", "s"):
        ResultsFormatConfiguration(time_unit=unit).validate()


def test_partitions_only_for_radix():
    cfg = Configuration(join_type=JoinAlgorithmType.NO_PARTITIONING)
    with pytest.raises(ValueError):
        validate_parsed_configuration(cfg, partitions_given=True)
    cfg.join_type = JoinAlgorithmType.RADIX_PARTITIONING
    validate_parsed_configuration(cfg, partitions_given=True)


def test_defaults_match_reference():
    cfg = Configuration()
    assert cfg.primary_relation_size == 10_000_000
    assert cfg.secondary_relation_size == 200_000_000
    assert cfg.skew_parameter == 1.05
    assert cfg.no_partitioning_config.min_batch_size == 10_000
    assert cfg.radix_clustering_config.number_of_partitions == 32
