"""The shipped VQA answer vocabulary + the vocabulary generator.

The artifact's 3129-way label ordering is load-bearing (the released VQA
checkpoints' answer head is indexed by it — reference train_vqa.py:107-108,
inf_vqa.py:45-47); these tests pin its invariants and exercise the
regeneration pipeline on synthetic annotations.
"""

import json

from uniter_tpu.utils.vqa_answers import (default_ans2label_path,
                                          load_ans2label)


def test_shipped_vocab_invariants():
    path = default_ans2label_path()
    assert path is not None, "in-tree ans2label.json missing"
    a2l = load_ans2label()
    assert len(a2l) == 3129
    # labels are a dense 0..3128 permutation (the head indexes by them)
    assert sorted(a2l.values()) == list(range(3129))
    # spot-pin a few entries: a reordered vocab would silently mis-label
    # every prediction of a checkpoint-loaded head
    assert a2l["yes"] == 3 and a2l["no"] == 9 and a2l["white"] == 4


def test_load_explicit_path(tmp_path):
    p = tmp_path / "a2l.json"
    p.write_text(json.dumps({"yes": 0, "no": 1}))
    assert load_ans2label(str(p)) == {"yes": 0, "no": 1}


def test_make_ans2label_pipeline(tmp_path):
    import sys
    sys.path.insert(0, "scripts")
    try:
        from make_ans2label import build_vocab, preprocess_answer
    finally:
        sys.path.pop(0)
    # official VQA normalization rules
    assert preprocess_answer("Two") == "2"
    assert preprocess_answer("the cat") == "cat"
    assert preprocess_answer("isnt") == "isn't"
    ann = tmp_path / "ann.json"
    anns = ([{"multiple_choice_answer": "yes"}] * 9
            + [{"multiple_choice_answer": "a dog"}] * 9
            + [{"multiple_choice_answer": "rare"}] * 8)
    ann.write_text(json.dumps({"annotations": anns}))
    vocab, counts = build_vocab([str(ann)], min_occurrence=9)
    assert vocab == {"yes": 0, "dog": 1}  # 'rare' below threshold
    assert counts["rare"] == 8
