#!/usr/bin/env python
"""Generate a VQA answer->label vocabulary from raw VQA annotations.

The reference ships utils/ans2label.json with no generator (the artifact
comes from the bottom-up-attention-vqa preprocessing: normalize every
multiple-choice answer with the official VQA-eval rules, keep answers with
>= --min_occurrence (9) occurrences over train+val). This reimplements
that pipeline so new vocabularies (other datasets, other thresholds) can
be built; note that the in-tree uniter_tpu/utils/ans2label.json must ship
verbatim because the released checkpoints' answer-head indices follow its
exact ordering.

Usage:
  python scripts/make_ans2label.py \
      --annotations v2_mscoco_train2014_annotations.json \
                    v2_mscoco_val2014_annotations.json \
      --output ans2label.json [--min_occurrence 9]

Also writes ``<output>.counts.json`` (answer -> occurrence) for auditing.
"""

from __future__ import annotations

import argparse
import json
import re
from collections import Counter

# Official VQA-eval normalization tables (VQA/PythonEvaluationTools
# vqaEval.py — public evaluation constants).
CONTRACTIONS = {
    "aint": "ain't", "arent": "aren't", "cant": "can't",
    "couldve": "could've", "couldnt": "couldn't",
    "couldn'tve": "couldn't've", "couldnt've": "couldn't've",
    "didnt": "didn't", "doesnt": "doesn't", "dont": "don't",
    "hadnt": "hadn't", "hadnt've": "hadn't've", "hadn'tve": "hadn't've",
    "hasnt": "hasn't", "havent": "haven't", "hed": "he'd",
    "hed've": "he'd've", "he'dve": "he'd've", "hes": "he's",
    "howd": "how'd", "howll": "how'll", "hows": "how's",
    "Id've": "I'd've", "I'dve": "I'd've", "Im": "I'm", "Ive": "I've",
    "isnt": "isn't", "itd": "it'd", "itd've": "it'd've",
    "it'dve": "it'd've", "itll": "it'll", "let's": "let's",
    "maam": "ma'am", "mightnt": "mightn't", "mightnt've": "mightn't've",
    "mightn'tve": "mightn't've", "mightve": "might've",
    "mustnt": "mustn't", "mustve": "must've", "neednt": "needn't",
    "notve": "not've", "oclock": "o'clock", "oughtnt": "oughtn't",
    "ow's'at": "'ow's'at", "'ows'at": "'ow's'at", "'ow'sat": "'ow's'at",
    "shant": "shan't", "shed've": "she'd've", "she'dve": "she'd've",
    "she's": "she's", "shouldve": "should've", "shouldnt": "shouldn't",
    "shouldnt've": "shouldn't've", "shouldn'tve": "shouldn't've",
    "somebody'd": "somebodyd", "somebodyd've": "somebody'd've",
    "somebody'dve": "somebody'd've", "somebodyll": "somebody'll",
    "somebodys": "somebody's", "someoned": "someone'd",
    "someoned've": "someone'd've", "someone'dve": "someone'd've",
    "someonell": "someone'll", "someones": "someone's",
    "somethingd": "something'd", "somethingd've": "something'd've",
    "something'dve": "something'd've", "somethingll": "something'll",
    "thats": "that's", "thered": "there'd", "thered've": "there'd've",
    "there'dve": "there'd've", "therere": "there're",
    "theres": "there's", "theyd": "they'd", "theyd've": "they'd've",
    "they'dve": "they'd've", "theyll": "they'll", "theyre": "they're",
    "theyve": "they've", "twas": "'twas", "wasnt": "wasn't",
    "wed've": "we'd've", "we'dve": "we'd've", "weve": "we've",
    "werent": "weren't", "whatll": "what'll", "whatre": "what're",
    "whats": "what's", "whatve": "what've", "whens": "when's",
    "whered": "where'd", "wheres": "where's", "whereve": "where've",
    "whod": "who'd", "whod've": "who'd've", "who'dve": "who'd've",
    "wholl": "who'll", "whos": "who's", "whove": "who've",
    "whyll": "why'll", "whyre": "why're", "whys": "why's",
    "wont": "won't", "wouldve": "would've", "wouldnt": "wouldn't",
    "wouldnt've": "wouldn't've", "wouldn'tve": "wouldn't've",
    "yall": "y'all", "yall'll": "y'all'll", "y'allll": "y'all'll",
    "yall'd've": "y'all'd've", "y'alld've": "y'all'd've",
    "y'all'dve": "y'all'd've", "youd": "you'd", "youd've": "you'd've",
    "you'dve": "you'd've", "youll": "you'll", "youre": "you're",
    "youve": "you've",
}
MANUAL_MAP = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10",
}
ARTICLES = {"a", "an", "the"}
PERIOD_STRIP = re.compile(r"(?!<=\d)(\.)(?!\d)")
COMMA_STRIP = re.compile(r"(\d)(,)(\d)")
PUNCT = [";", r"/", "[", "]", '"', "{", "}", "(", ")", "=", "+", "\\",
         "_", "-", ">", "<", "@", "`", ",", "?", "!"]


def process_punctuation(text: str) -> str:
    out = text
    for p in PUNCT:
        if (p + " " in text or " " + p in text) or (
                re.search(COMMA_STRIP, text) is not None):
            out = out.replace(p, "")
        else:
            out = out.replace(p, " ")
    out = PERIOD_STRIP.sub("", out, re.UNICODE)
    return out


def process_digit_article(text: str) -> str:
    tmp = []
    for word in text.lower().split():
        word = MANUAL_MAP.get(word, word)
        if word not in ARTICLES:
            tmp.append(word)
    for i, word in enumerate(tmp):
        if word in CONTRACTIONS:
            tmp[i] = CONTRACTIONS[word]
    return " ".join(tmp)


def preprocess_answer(answer: str) -> str:
    answer = answer.replace("\n", " ").replace("\t", " ").strip()
    answer = process_digit_article(process_punctuation(answer))
    answer = answer.replace(",", "")
    return answer


def build_vocab(annotation_files, min_occurrence: int = 9):
    counts: Counter = Counter()
    order = {}  # first-seen order of qualifying answers
    for path in annotation_files:
        with open(path) as f:
            anns = json.load(f)["annotations"]
        for ann in anns:
            ans = preprocess_answer(ann["multiple_choice_answer"])
            counts[ans] += 1
            if ans not in order:
                order[ans] = len(order)
    kept = [a for a in order if counts[a] >= min_occurrence]
    return {a: i for i, a in enumerate(kept)}, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotations", nargs="+", required=True,
                    help="VQA v2 annotation json(s), e.g. train+val")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min_occurrence", type=int, default=9)
    opts = ap.parse_args()
    ans2label, counts = build_vocab(opts.annotations, opts.min_occurrence)
    with open(opts.output, "w") as f:
        json.dump(ans2label, f)
    with open(opts.output + ".counts.json", "w") as f:
        json.dump({a: counts[a] for a in ans2label}, f)
    print(f"wrote {len(ans2label)} answers "
          f"(>= {opts.min_occurrence} occurrences) to {opts.output}")


if __name__ == "__main__":
    main()
