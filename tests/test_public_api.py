"""Top-level API surface: every reference-exported function has a lazy
top-level equivalent (`import ldweaver_tpu; ldweaver_tpu.<name>`)."""

import ldweaver_tpu


def test_every_api_symbol_resolves():
    for name in ldweaver_tpu.__all__:
        obj = getattr(ldweaver_tpu, name)
        assert callable(obj) or name == "LDWeaverConfig", name


def test_dir_lists_api():
    d = dir(ldweaver_tpu)
    for name in ("ldweaver", "perform_mi_computation", "create_tanglegram",
                 "view_tree", "parse_genbank_file"):
        assert name in d


def test_unknown_attribute_raises():
    import pytest

    with pytest.raises(AttributeError):
        ldweaver_tpu.not_a_function
