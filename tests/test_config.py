"""Config system tests: six reference knobs, parameter-file import/export, guard."""

import pytest

from ldagibbssampling_tpu.config import LdaConfig


def test_defaults_match_reference():
    c = LdaConfig()
    assert (c.alpha, c.beta, c.topic_num) == (0.5, 0.1, 100)
    assert (c.iteration, c.save_step, c.begin_save_iters) == (100, 10, 50)


def test_reference_parameter_file_roundtrip(tmp_path):
    c = LdaConfig(alpha=0.25, beta=0.05, topic_num=10, iteration=200,
                  save_step=20, begin_save_iters=100)
    p = tmp_path / "LdaParameters.txt"
    c.to_reference_parameter_file(p)
    c2 = LdaConfig.from_reference_parameter_file(p)
    assert (c2.alpha, c2.beta, c2.topic_num) == (0.25, 0.05, 10)
    assert (c2.iteration, c2.save_step, c2.begin_save_iters) == (200, 20, 100)


def test_reference_parameter_file_unknown_keys_ignored(tmp_path):
    p = tmp_path / "params.txt"
    p.write_text("alpha\t0.7\nbogusKey\t3\ntopicNum\t12\n")
    c = LdaConfig.from_reference_parameter_file(p)
    assert c.alpha == 0.7
    assert c.topic_num == 12
    assert c.beta == 0.1  # untouched default


def test_reference_guard():
    LdaConfig(iteration=60, save_step=10, begin_save_iters=50).validate_reference_guard()
    with pytest.raises(ValueError):
        LdaConfig(iteration=59, save_step=10,
                  begin_save_iters=50).validate_reference_guard()


def test_json_roundtrip(tmp_path):
    c = LdaConfig(topic_num=7, backend="cvb0", seed=3)
    p = tmp_path / "c.json"
    c.to_json(p)
    assert LdaConfig.from_json(p) == c


def test_unknown_config_key_rejected():
    with pytest.raises(ValueError):
        LdaConfig.from_dict({"nope": 1})


def test_invalid_enum_values_rejected():
    with pytest.raises(ValueError):
        LdaConfig(backend="bogus")
    with pytest.raises(ValueError):
        LdaConfig(sampler="bogus")
    with pytest.raises(ValueError):
        LdaConfig(draw_method="bogus")


def test_conf_path_constants_match_reference_defaults():
    """conf.py mirrors PathConfig/ConstantConfig (SURVEY.md §2.1 #6-#7)."""
    from ldagibbssampling_tpu import conf
    from ldagibbssampling_tpu.cli import build_parser

    args = build_parser().parse_args([])
    assert args.docs == conf.LDA_DOCS_PATH == "data/LdaOriginalDocs/"
    assert args.results == conf.LDA_RESULTS_PATH == "data/LdaResults/"
    assert conf.LDA_PARAMETER_FILE.endswith("LdaParameters.txt")
