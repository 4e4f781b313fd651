import numpy as np
import pytest

from maze_image_processing_pipeline_tpu.polytaxo import (
    Description,
    NegatedRealNode,
    PolyTaxonomy,
)

TAXONOMY = {
    "Copepoda": {
        "_index": 0,
        "_alias": ["Copepod*"],
        "_tags": {
            "oil-sack": 5,
            "egg": {"_index": 6, "_meta": {"predict": False}},
        },
        "_virtuals": {
            "Calanoida with oil": "Copepoda>Calanoida oil-sack",
        },
        "Calanoida": {
            "_index": 1,
            "Calanus": 3,
            "Metridia": 4,
        },
        "Cyclopoida": {"_index": 2},
    },
    "Chaetognatha": {"_index": 7},
}


@pytest.fixture(scope="module")
def tax():
    return PolyTaxonomy.from_dict(TAXONOMY)


class TestTree:
    def test_find_node(self, tax):
        assert tax.find_node("Calanus").index == 3
        assert tax.find_node("Copepoda>Calanoida").index == 1
        assert tax.find_node("oil-sack").index == 5
        assert tax.find_node("Copepodite").name == "Copepoda"  # alias wildcard

    def test_format_tree(self, tax):
        out = tax.format_tree()
        assert "Calanoida [1]" in out
        assert "+ oil-sack [5]" in out
        assert "~ Calanoida with oil" in out

    def test_applicable_tags_inherited(self, tax):
        calanus = tax.find_node("Calanus")
        names = {t.name for t in calanus.applicable_tags()}
        assert "oil-sack" in names and "egg" in names

    def test_get_applicable_virtuals(self, tax):
        calanus = tax.find_node("Calanus")
        assert [v.name for v in calanus.get_applicable_virtuals()] == [
            "Calanoida with oil"
        ]


class TestDescription:
    def test_str_and_update(self, tax):
        d = Description(tax.root).update([tax.find_node("Calanus")])
        assert str(d) == "Copepoda>Calanoida>Calanus"
        d.update([tax.find_node("oil-sack")])
        assert str(d) == "Copepoda>Calanoida>Calanus oil-sack"

    def test_anchor_refinement_and_conflict(self, tax):
        d = Description(tax.root).update([tax.find_node("Calanoida")])
        d.update([tax.find_node("Calanus")])
        assert d.anchor.name == "Calanus"
        with pytest.raises(ValueError):
            d.update([tax.find_node("Cyclopoida")])

    def test_negation_removes_positive(self, tax):
        egg = tax.find_node("egg")
        d = Description(tax.root).update([tax.find_node("Calanus"), egg])
        assert d.contains(egg)
        d.update([NegatedRealNode(egg)])
        assert not d.contains(egg)
        assert NegatedRealNode(egg) in d.qualifiers

    def test_le_ordering(self, tax):
        broad = Description(tax.root).update([tax.find_node("Calanoida")])
        narrow = Description(tax.root).update(
            [tax.find_node("Calanus"), tax.find_node("oil-sack")]
        )
        assert broad <= narrow
        assert not (narrow <= broad)


class TestExpression:
    def test_match(self, tax):
        d = Description(tax.root).update(
            [tax.find_node("Calanus"), tax.find_node("oil-sack")]
        )
        assert tax.parse_expression("Calanoida").match(d)
        assert tax.parse_expression("Calanoida oil-sack").match(d)
        assert not tax.parse_expression("Cyclopoida").match(d)
        assert not tax.parse_expression("Calanoida egg").match(d)
        assert tax.parse_expression("Calanoida !egg").match(d)

    def test_apply(self, tax):
        d = Description(tax.root).update([tax.find_node("Calanoida")])
        out = tax.parse_expression("Calanus oil-sack").apply(d)
        assert out.anchor.name == "Calanus"
        assert out.contains(tax.find_node("oil-sack"))
        # original untouched
        assert d.anchor.name == "Calanoida"

    def test_apply_negation(self, tax):
        d = Description(tax.root).update(
            [tax.find_node("Calanus"), tax.find_node("egg")]
        )
        out = tax.parse_expression("!egg").apply(d)
        assert not out.contains(tax.find_node("egg"))

    def test_virtual_lookup_and_apply(self, tax):
        # Virtual names may contain spaces; the whitespace-separated
        # expression grammar can't reference them, but find_node can.
        v = tax.find_node("Calanoida with oil")
        out = Description(tax.root).add(v.description)
        assert out.anchor.name == "Calanoida"
        assert out.contains(tax.find_node("oil-sack"))


class TestLineage:
    def test_get_description(self, tax):
        d = tax.get_description(["Copepoda", "Calanoida", "Calanus"])
        assert d.anchor.name == "Calanus"

    def test_missing_intermediaries(self, tax):
        with pytest.raises(ValueError):
            tax.get_description(["Copepoda", "Calanus"])
        d = tax.get_description(
            ["Copepoda", "Calanus"], ignore_missing_intermediaries=True
        )
        assert d.anchor.name == "Calanus"

    def test_lineage_with_tag_and_virtual(self, tax):
        d = tax.get_description(["Copepoda", "Calanoida", "oil-sack"])
        assert d.anchor.name == "Calanoida"
        assert d.contains(tax.find_node("oil-sack"))

        d2 = tax.get_description(["Copepoda", "Calanoida with oil"])
        assert d2.anchor.name == "Calanoida"
        assert d2.contains(tax.find_node("oil-sack"))

    def test_alias_lineage(self, tax):
        d = tax.get_description(["Copepods", "Calanoida"], with_alias=True)
        assert d.anchor.name == "Calanoida"


class TestParseProbabilities:
    def probs(self, **kwargs):
        p = np.zeros(8, np.float32)
        idx = {"cop": 0, "cal": 1, "cyc": 2, "calanus": 3, "met": 4, "oil": 5, "egg": 6, "chaet": 7}
        for k, v in kwargs.items():
            p[idx[k]] = v
        return p

    def test_greedy_descent(self, tax):
        p = self.probs(cop=0.99, cal=0.95, calanus=0.97, met=0.1, oil=0.95, egg=0.5)
        d = tax.parse_probabilities(p, thr_pos_abs=0.9, thr_neg=0.1)
        assert d.anchor.name == "Calanus"
        assert d.contains(tax.find_node("oil-sack"))
        # egg at 0.5: neither accepted nor negated
        assert not d.contains(tax.find_node("egg"))
        assert NegatedRealNode(tax.find_node("egg")) not in d.qualifiers

    def test_stops_below_threshold(self, tax):
        p = self.probs(cop=0.99, cal=0.5, cyc=0.4)
        d = tax.parse_probabilities(p, thr_pos_abs=0.9)
        assert d.anchor.name == "Copepoda"

    def test_relative_threshold(self, tax):
        p = self.probs(cop=0.99, cal=0.95, cyc=0.94)
        d = tax.parse_probabilities(p, thr_pos_abs=0.9, thr_pos_rel=0.05)
        assert d.anchor.name == "Copepoda"  # margin too small

    def test_negative_tags(self, tax):
        p = self.probs(cop=0.99, cal=0.95, egg=0.01, oil=0.5)
        d = tax.parse_probabilities(p, thr_pos_abs=0.9, thr_neg=0.1)
        assert NegatedRealNode(tax.find_node("egg")) in d.qualifiers

    def test_baseline_constrains_walk(self, tax):
        # Probabilities favor Chaetognatha, but baseline anchors at Calanoida.
        p = self.probs(chaet=0.99, cal=0.2, calanus=0.95)
        base = Description(tax.root).update([tax.find_node("Calanoida")])
        d = tax.parse_probabilities(p, baseline=base, thr_pos_abs=0.9)
        assert d.anchor.name == "Calanus"  # refined within the baseline subtree


class TestRound3HuntFixes:
    def test_nested_plain_tag_keys_build_child_tags(self):
        """Child tags nest as plain keys (primary-node style) or under
        _children — plain keys used to be silently dropped."""
        from maze_image_processing_pipeline_tpu.polytaxo import PolyTaxonomy

        tax = PolyTaxonomy.from_dict(
            {
                "Copepoda": {
                    "_index": 0,
                    "_tags": {"egg": {"_index": 8, "early": {"_index": 9}}},
                }
            }
        )
        assert tax.find_node("early").index == 9

    def test_unknown_tag_key_raises(self):
        from maze_image_processing_pipeline_tpu.polytaxo import PolyTaxonomy

        with pytest.raises(ValueError, match="Unknown tag key"):
            PolyTaxonomy.from_dict(
                {"A": {"_index": 0, "_tags": {"t": {"_idnex": 3}}}}
            )

    def test_duplicate_classifier_index_raises(self):
        from maze_image_processing_pipeline_tpu.polytaxo import PolyTaxonomy

        with pytest.raises(ValueError, match="Duplicate classifier index"):
            PolyTaxonomy.from_dict({"A": {"_index": 0, "B": 1, "C": 1}})
