"""Golden tests for the self-contained EnglishTextNormalizer.

Two independent oracles:
  1. Fixed input/output pairs (hand-derived from the protocol's published
     rules — reference: examples/whisper/cal_wer.py:281-285 normalizes both
     sides with this exact rule set before jiwer).
  2. The HuggingFace transformers implementation of the same protocol
     (transformers.models.whisper.english_normalizer), run with OUR spelling
     table so both pipelines are complete — every sentence in the battery
     plus a deterministic fuzz sweep over the number grammar must match
     exactly.
"""

import random

import pytest

from whisper_trtllm_tpu.utils.normalizer import (
    UK_TO_US,
    EnglishTextNormalizer,
    NumberParser,
    americanize,
    normalize_numbers,
    strip_symbols_and_diacritics,
)

norm = EnglishTextNormalizer()


GOLDEN = [
    # contractions & titles
    ("He won't go, and she can't stay.",
     "he will not go and she can not stay"),
    ("Let's see what Mr. Brown and Mrs. Smith said to Dr. Jones.",
     "let us see what mister brown and missus smith said to doctor jones"),
    ("they're gonna wanna leave 'cause it's late",
     "they are going to want to leave cause it is late"),
    ("I'd been there; he's got it. y'all shoulda known.",
     "i had been there he has got it you all should have known"),
    # fillers and bracketed asides
    ("um well [noise] it was (quietly) fine hmm",
     "well it was fine"),
    # numbers: cardinals, ordinals, plurals
    ("twenty two people saw one hundred and five birds",
     "22 people saw 105 birds"),
    ("the one hundred seventy second time", "the 172nd time"),
    ("he came fourth of seven hundred", "he came 4th of 700"),
    ("in the nineteen sixties and seventies", "in the 1960s and 70s"),
    ("three million four hundred thousand", "3400000"),
    ("two hundred thousand dollars", "$200000"),
    ("nineteen eighty four", "1984"),
    ("one oh one dalmatians", "101 dalmatians"),
    ("double oh seven", "007"),
    ("triple seven airline", "777 airline"),
    ("four point five percent", "4.5%"),
    ("two and a half hours", "2.5 hours"),
    ("minus forty degrees", "-40 degrees"),
    ("five dollars and seventy cents", "$5.70"),
    ("thirty five pounds", "£35"),
    ("a thousand and one nights", "a 1001 nights"),
    ("seven per cent of voters", "7% of voters"),
    # literal one stays a word
    ("one of the ones I like", "one of the ones i like"),
    # punctuation / diacritics
    ("naïve café-goers résumé", "naive cafe goers resume"),
    ("1,234,567 things", "1234567 things"),
    ("the U.S.A. is big", "the u s a is big"),
    # british -> american
    ("the colour of the harbour neighbours favour",
     "the color of the harbor neighbors favor"),
    ("he apologised and organised the theatre programme",
     "he apologized and organized the theater program"),
    ("they travelled with grey pyjamas and a moustache",
     "they traveled with gray pajamas and a mustache"),
]


@pytest.mark.parametrize("text,expect", GOLDEN, ids=range(len(GOLDEN)))
def test_golden_pairs(text, expect):
    assert norm(text) == expect


def test_idempotent_on_golden():
    for _, expect in GOLDEN:
        if "007" in expect or "-" in expect:
            # Fraction re-parse strips nominal leading zeros, and a sign
            # char is punctuation on the second pass — the protocol itself
            # is not idempotent there (HF behaves identically)
            continue
        assert norm(expect) == expect


def test_strip_symbols():
    assert strip_symbols_and_diacritics("œuvre façade ßtraße") \
        == "oeuvre facade sstrasse"
    assert strip_symbols_and_diacritics("a+b=c%", keep="%") == "a b c%"


def test_spelling_table_shape():
    # every value must be the American form (no identity maps, no cycles)
    for uk, us in UK_TO_US.items():
        assert uk != us
        assert us not in UK_TO_US
    assert americanize("realise the colour") == "realize the color"
    # words that look British-ish but are correct American stay put
    for w in ("surprise", "promise", "advertise", "exercise", "wise",
              "compromise", "premise", "supervise", "devise", "televise"):
        assert americanize(w) == w


# --------------------------------------------------------------------------
# cross-implementation goldens vs HuggingFace transformers
# --------------------------------------------------------------------------

hf_norm_mod = pytest.importorskip(
    "transformers.models.whisper.english_normalizer")


@pytest.fixture(scope="module")
def hf_norm():
    return hf_norm_mod.EnglishTextNormalizer(UK_TO_US)


BATTERY = [t for t, _ in GOLDEN] + [
    "it costs $12.50, not twelve pounds fifty!",
    "three hundred and forty-two thousand, one hundred and seven",
    "she was born on june the twenty-first, nineteen ninety-nine",
    "a sixth of the two hundredths of a percent",
    "fifties sixties seventies eighties nineties",
    "first second third fourth fifth sixth seventh eighth ninth tenth",
    "eleventh twelfth thirteenth twentieth thirtieth hundredth thousandth",
    "ones twos threes sixes sevens twenties thirties hundreds thousands",
    "zero point zero zero one percent",
    "point five point six",
    "oh oh oh one two three",
    "double two triple nine oh",
    "plus seven minus eight positive nine negative ten",
    "a million dollars and one cent",
    "two dollars and seven cents",
    "euro euros pound pounds cent cents dollar dollars",
    "one hundred and and two",
    "seven point", "point", "and", "double", "triple trouble",
    "hundred thousand million billion trillion",
    "five hundredths and three tenths",
    "he has 3 cats, she's got 42 dogs; they'd 7 fish.",
    "the 1st, the 2nd, the 3rd, the 4th, and the 23rd",
    "10,000 leagues; 1,000,000 miles",
    "I.B.M. and N.A.S.A. in the U.K.",
    "it's it's its it isn't ain't aren't won't can't shan't",
    "mr mrs st dr prof capt gov ald gen sen rep pres rev hon asst assoc lt col jr sr esq",
    "o'clock o'brien d'artagnan ma'am",
    "twenty-two thirty-three forty-four hyphen-ated",
    "one two three four five six seven eight nine ten",
    "nineteen oh five", "twenty twenty", "twenty twenty-one",
    "four score and seven years ago",
    "a dozen eggs cost two dollars fifty",
    "number nine number nine number nine",
    "seven thousand eight hundred and sixty-five",
    "twelve hundred", "fifteen hundred hours",
    "one and a half", "a mile and a half", "an hour and a half",
    "six and a half million", "two and a half percent",
    "$5 and ¢70", "99.9% of the time",
    "the temperature was minus five point five degrees",
]


def test_matches_hf_battery(hf_norm):
    for text in BATTERY:
        assert norm(text) == hf_norm(text), f"mismatch on: {text!r}"


def test_matches_hf_fuzz_numbers(hf_norm):
    """Deterministic fuzz over the number grammar: random word salads from
    the number vocabulary + filler words, both implementations must agree."""
    vocab = (
        "one two three seven nine ten eleven fifteen nineteen twenty fifty "
        "ninety hundred thousand million oh zero point and a half double "
        "triple minus plus dollars cents pounds percent per cent first "
        "third fifth twelfth fortieth hundredth sixes sevens twenties "
        "thousands cat the 3 42 7.5 1,000 o'clock it's won't"
    ).split()
    rng = random.Random(0)
    for _ in range(400):
        n = rng.randint(1, 12)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        assert norm(text) == hf_norm(text), f"mismatch on: {text!r}"


def test_number_parser_direct():
    assert NumberParser().run("one two three".split()) == ["123"]
    assert NumberParser().run(
        "four hundred twenty two".split()) == ["422"]
    assert normalize_numbers("one oh one") == "101"
    assert normalize_numbers("seventeen seventy six") == "1776"
