"""CLI driver tests: flag parity, output schema parity, validation.

Schema oracle: /root/reference/results/1.05/partitions_64.txt —
{id, parameters{NumberOfPartitions, PrimaryRelationSize,
SecondaryRelationSize, Skew, Type}, results{partition, build, probe}}.
"""

import json

import pytest

from partitionedhashjoin_tpu.cli import main, parse_arguments


def _run(tmp_path, argv):
    out = tmp_path / "result.json"
    rc = main(argv + ["--output", "file", "--filename", str(out)])
    assert rc == 0
    return json.loads(out.read_text())


def test_no_partitioning_output_schema(tmp_path):
    doc = _run(
        tmp_path,
        ["--primary", "5000", "--secondary", "20000", "--seed", "1",
         "--join", "no-partitioning", "--log", "error"],
    )
    assert doc["id"] == "hashjointimingresult"
    assert doc["parameters"] == {
        "PrimaryRelationSize": "5000",
        "SecondaryRelationSize": "20000",
        "Skew": "1.050000",
        "Type": "NoPartitioning",
    }
    assert set(doc["results"]) == {"partition", "build", "probe"}
    assert doc["results"]["partition"] == "0"
    assert int(doc["results"]["probe"]) >= 0


def test_radix_output_includes_partitions(tmp_path):
    doc = _run(
        tmp_path,
        ["--primary", "4096", "--secondary", "16384", "--seed", "2",
         "--join", "radix-partitioning", "--partitions", "32",
         "--log", "error"],
    )
    assert doc["parameters"]["Type"] == "RadixPartitioning"
    assert doc["parameters"]["NumberOfPartitions"] == "32"


def test_uniform_keys_via_skew_zero(tmp_path, capsys):
    """--skew 0 = uniform secondary keys (BASELINE.json 'uniform keys'
    configs); the count oracle (matches == secondary size) holds because
    uniform draws stay inside the primary's [1, N] key range.  The count
    is not part of the reference JSON schema, so it is read back from the
    joiner's info log line."""
    import re

    doc = _run(
        tmp_path,
        ["--primary", "4096", "--secondary", "16384", "--seed", "9",
         "--skew", "0", "--join", "sort-merge", "--log", "info"],
    )
    assert doc["parameters"]["Skew"] == "0.000000"
    m = re.search(r"Join produced (\d+) matches", capsys.readouterr().err)
    assert m is not None
    assert int(m.group(1)) == 16384


def test_sort_merge_and_unit_seconds(tmp_path):
    doc = _run(
        tmp_path,
        ["--primary", "4096", "--secondary", "16384", "--seed", "3",
         "--join", "sort-merge", "--unit", "s", "--log", "error"],
    )
    assert doc["parameters"]["Type"] == "SortMerge"
    assert int(doc["results"]["probe"]) <= 60  # seconds, not ms


def test_planned_join_records_plan(tmp_path):
    doc = _run(
        tmp_path,
        ["--primary", "4096", "--secondary", "16384", "--seed", "5",
         "--join", "planned", "--log", "error"],
    )
    assert doc["parameters"]["Type"] == "Planned"
    # sequential primary relation => dense => the interval plan
    assert doc["parameters"]["Plan"] == "interval"
    assert set(doc["results"]) == {"partition", "build", "probe"}


def test_shuffle_join_records_shards(tmp_path):
    doc = _run(
        tmp_path,
        ["--primary", "4096", "--secondary", "16384", "--seed", "4",
         "--join", "shuffle", "--shards", "8", "--log", "error"],
    )
    assert doc["parameters"]["Type"] == "DistributedShuffle"
    assert doc["parameters"]["NumberOfShards"] == "8"


def test_partitions_rejected_for_non_radix():
    with pytest.raises(SystemExit):
        parse_arguments(
            ["--join", "no-partitioning", "--partitions", "8"]
        )


def test_default_configuration_matches_reference():
    config, args = parse_arguments([])
    assert config.primary_relation_size == 10_000_000
    assert config.secondary_relation_size == 200_000_000
    assert config.skew_parameter == 1.05
    assert args.join == "no-partitioning"
    assert config.output_format_config.time_unit == "ms"


def test_int64_key_dtype_sort_merge(tmp_path):
    import jax

    try:
        doc = _run(
            tmp_path,
            ["--primary", "4096", "--secondary", "16384", "--seed", "6",
             "--join", "sort-merge", "--key-dtype", "int64", "--log", "error"],
        )
        assert doc["parameters"]["Type"] == "SortMerge"
    finally:
        # the CLI enables x64 process-wide; undo so other tests keep int32
        jax.config.update("jax_enable_x64", False)


def test_int64_rejected_for_hash_joins():
    with pytest.raises(SystemExit):
        parse_arguments(["--join", "no-partitioning", "--key-dtype", "int64"])


def test_reference_spelling_compat_flag(tmp_path):
    doc = _run(
        tmp_path,
        ["--primary", "512", "--secondary", "2048", "--seed", "2",
         "--join", "radix-partitioning", "--partitions", "4",
         "--reference-spelling", "--log", "error"],
    )
    # byte parity with the reference's typo'd enum literal (main.cpp:127)
    assert doc["parameters"]["Type"] == "RadixParitioning"


def test_prime_sized_relations_end_to_end(tmp_path):
    # prime sizes exercise the overlapping-window dispatch chunking
    doc = _run(
        tmp_path,
        ["--primary", "1009", "--secondary", "4999", "--seed", "4",
         "--join", "radix-partitioning", "--partitions", "8",
         "--log", "error"],
    )
    assert int(doc["results"]["probe"]) >= 0
