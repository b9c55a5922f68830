"""Language-ID heuristic: real sentences per supported language resolve to
that language; marker-free text resolves to 'und'."""

import pytest

from lsh_qd_spark.oracle import LANG_MARKERS, q_langid

SENTENCES = {
    "en": "the cat sat on the mat and it is warm in that room",
    "de": "der hund und die katze sind nicht im haus",
    "fr": "le chat et la souris sont dans les champs",
    "es": "los perros y el gato corren por la casa como locos",
    "pt": "o menino e a menina estão em um parque com amigos",
    "it": "il gatto di anna che per la casa non sono gli amici",
    "nl": "ik denk dat het een goede dag is niet ze van",
    "sv": "det är inte och att som på av en dag",
    "pl": "i w nie na to się jest z domu",
    "tr": "ve bir bu için ne gibi çok ama güzel",
    "id": "yang dan di itu dengan ini untuk tidak baik",
    "fi": "ja on ei että hän se mutta oli hyvä",
    "und": "zzz qqq www lorem42",
}


@pytest.fixture(scope="module")
def lang_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("langid_sf")
    rows = [(i, text) for i, text in enumerate(SENTENCES.values())]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(root / "documents.parquet"))
    return str(root)


def test_langid_identifies_each_language(spark, lang_sf_dir):
    got = {
        r["doc_id"]: r["lang_guess"]
        for r in q_langid(spark, lang_sf_dir).collect()
    }
    expected = list(SENTENCES.keys())
    for i, lang in enumerate(expected):
        assert got[i] == lang, f"doc {i}: expected {lang}, got {got[i]}"


def test_markers_are_lowercase_and_nonempty():
    for lang, ws in LANG_MARKERS.items():
        assert len(ws) >= 6, lang
        assert all(w == w.lower() and w for w in ws), lang


def test_planted_multilingual_accuracy(spark, tmp_path):
    """Accuracy bound on a planted multilingual fixture: per-language docs
    mixing 40% function words (sampled from the FULL public-list profile,
    ambiguous words included) with 60% language-neutral content tokens.
    Stated bound: >=0.95 accuracy over 12 languages x 40 docs."""
    import json
    import random
    from importlib import resources

    raw = json.loads(
        resources.files("lsh_qd_spark.data")
        .joinpath("lang_profiles.json")
        .read_text("utf-8")
    )
    raw.pop("_comment", None)
    rng = random.Random(7)
    rows, want = [], {}
    doc_id = 0
    for lang, words in raw.items():
        for _ in range(40):
            toks = [
                rng.choice(words)
                if rng.random() < 0.4
                else f"w{rng.randrange(5000)}"
                for _ in range(50)
            ]
            rows.append((doc_id, " ".join(toks)))
            want[doc_id] = lang
            doc_id += 1
    root = tmp_path / "ml_sf"
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(root / "documents.parquet")
    )
    got = {
        r["doc_id"]: r["lang_guess"]
        for r in q_langid(spark, str(root)).collect()
    }
    acc = sum(got[i] == want[i] for i in want) / len(want)
    assert acc >= 0.95, f"accuracy {acc:.3f}"
