"""Property-based fuzz of the job-spec parser (hypothesis).

The reference parser crashes on a line without '=' (vector::at throws,
``src/mapreduce_spec.h:68``) and atoi's garbage to 0; ours promises a
tighter contract — parse_spec_text(anything) either returns a
MapReduceSpec or raises ValueError, and well-formed specs round-trip
exactly. No Spark session needed: pure-Python module.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from mapreduce_infrastructure_spark.jobspec import (
    MapReduceSpec,
    parse_spec_text,
    validate_spec,
)

# Tokens that survive the parser's strip/split unchanged: no '=', ',',
# '#', whitespace, and not empty.
_token = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Zs", "Zl", "Zp", "Cc"),
        blacklist_characters="=,#",
    ),
    min_size=1,
    max_size=20,
).filter(lambda s: s.strip() == s and s)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_parser_total_on_arbitrary_text(content):
    """Totality: any text parses or raises ValueError — never IndexError,
    TypeError, Unicode errors, or silent atoi-style zeroing."""
    try:
        spec = parse_spec_text(content)
    except ValueError:
        return
    assert isinstance(spec, MapReduceSpec)


@settings(max_examples=150, deadline=None)
@given(
    n_workers=st.integers(min_value=1, max_value=64),
    addrs=st.lists(_token, min_size=1, max_size=8),
    files=st.lists(_token, min_size=1, max_size=8),
    output_dir=_token,
    n_output_files=st.integers(min_value=1, max_value=999),
    map_kilobytes=st.integers(min_value=1, max_value=10**6),
    user_id=_token,
)
def test_wellformed_spec_roundtrips(
    n_workers, addrs, files, output_dir, n_output_files, map_kilobytes, user_id
):
    ini = "\n".join(
        [
            f"n_workers={n_workers}",
            f"worker_ipaddr_ports={','.join(addrs)}",
            f"input_files={','.join(files)}",
            f"output_dir={output_dir}",
            f"n_output_files={n_output_files}",
            f"map_kilobytes={map_kilobytes}",
            f"user_id={user_id}",
        ]
    )
    spec = parse_spec_text(ini)
    assert spec == MapReduceSpec(
        n_workers=n_workers,
        worker_ipaddr_ports=addrs,
        input_files=files,
        output_dir=output_dir,
        n_output_files=n_output_files,
        map_kilobytes=map_kilobytes,
        user_id=user_id,
    )


@settings(max_examples=100, deadline=None)
@given(
    key=st.sampled_from(["n_workers", "n_output_files", "map_kilobytes"]),
    bad=st.text(max_size=12).filter(
        lambda s: not __import__("re").fullmatch(r"\s*[+-]?[0-9]+\s*", s)
    ),
)
def test_malformed_numerics_raise(key, bad):
    """atoi would return 0 here and validation would blame the wrong
    thing; the parser must name the key at the parse site. Values whose
    strip contains '=' or '#' or a newline mutate the line shape instead
    of reaching the int parser, so constrain to single-line values."""
    if any(c in bad for c in "=#\n\r") or not bad.strip():
        return
    try:
        parse_spec_text(f"{key}={bad}")
    except ValueError as e:
        assert key in str(e)
    else:
        raise AssertionError(f"{key}={bad!r} parsed without error")


def test_duplicate_keys_last_wins_and_unknown_ignored():
    spec = parse_spec_text(
        "n_workers=2\nn_workers=5\nnot_a_key=zzz\n# comment\nuser_id=wc"
    )
    assert spec.n_workers == 5 and spec.user_id == "wc"


def test_validation_rejects_mismatched_worker_count(tmp_path):
    f = tmp_path / "in.txt"
    f.write_text("x")
    spec = parse_spec_text(
        "n_workers=3\nworker_ipaddr_ports=a:1,b:2\ninput_files="
        + str(f)
        + "\noutput_dir=o\nn_output_files=1\nmap_kilobytes=16\nuser_id=wc"
    )
    import pytest

    with pytest.raises(ValueError, match="does not match"):
        validate_spec(spec)
