#!/usr/bin/env python
"""Expand the hand-authored base lexicon with regular inflections.

The reference ships g2p_en's full CMU lexicon
(litfass/synthesis/g2p.py:28-43); offline, this repo ships a curated base
lexicon (lightningfastspeech2_tpu/data/lexicon_en.txt) and derives regular
inflected forms with standard English morphophonology:

  -s / -es   plural & 3rd person: /IH0 Z/ after sibilants, /S/ after
             voiceless consonants, /Z/ elsewhere
  -ed        past: /IH0 D/ after t,d; /T/ after voiceless; /D/ elsewhere
  -ing       /IH0 NG/ (drop silent e, CVC doubling)
  -er/-est   comparatives on listed adjectives: /ER0/, /AH0 S T/
  -ly        adverbs on listed adjectives: /L IY0/

Only content words are expanded (verbs from the VERBS list get -s/-ed/
-ing; adjectives from ADJS get -er/-est/-ly; other non-function words get
-s). The result trains the neural G2P (scripts/train_g2p.py) and ships as
lexicon_en_expanded.txt.

Usage: python scripts/build_lexicon.py \
    [--base lightningfastspeech2_tpu/data/lexicon_en.txt] \
    [--out lightningfastspeech2_tpu/data/lexicon_en_expanded.txt]
"""

import argparse
import re
from pathlib import Path

SIBILANTS = {"S", "Z", "SH", "ZH", "CH", "JH"}
VOICELESS = {"P", "T", "K", "F", "TH", "S", "SH", "CH"}
VOWEL_LETTERS = set("aeiou")

# regular verbs from the base lexicon that take -s/-ed/-ing with regular
# spelling+phonology (irregular verbs are listed as explicit forms in the
# base lexicon instead)
VERBS = """
ask answer call carry change check clean close cook count cry dance
decide dream explain finish follow happen hate help hope imagine jump
kill laugh learn listen live love look move need open play pull push
remember rest return save show smile stay stop talk touch travel try
turn visit wait walk watch wish wonder believe consider continue create
expect include offer provide reach receive report require seem serve
suggest support allow add agree appear apply argue arrive attack avoid
cause claim compare complete contain cover describe develop discuss
enjoy enter exist fail fill fit focus form improve increase indicate
involve join manage mention notice occur pass perform pick plan prepare
produce protect prove raise realize reduce relate remain remove
represent result reveal share sign sort suffer thank treat worry want
use work start rain snow
""".split()

# adjectives that take regular -er/-est/-ly
ADJS = """
small long short high low old young great bad late hard strong weak
fast slow cold warm cool happy sad angry tired sick pretty nice fine
clear dark bright heavy deep wide narrow thick thin clean dirty dry wet
loud quiet rich poor safe sure busy simple
""".split()

# function words & categories never expanded
NO_EXPAND = """
the be to of and a in that have i it for not on with he as you do at
this but his by from they we say her she or an will my one all would
there their what so up out if about who which go me when can like no
just him into your some could them than then now only its over also
after even our first well way because any these most us is was are been
has had were said did being am does done went gone made knew known took
taken came saw seen got gotten gave given found thought told became
become left felt put brought began begun kept held wrote written stood
heard let meant set met ran run paid sat spoke spoken lay grew grown
lost fell fallen sent built understood drew drawn broke broken spent cut
rose risen sold chose chosen slept won bought caught taught flew flown
threw thrown wore worn ate eaten drove driven sang sung rang rung swam
swum forgot forgotten men women children feet teeth mice leaves how very
too quite rather almost already still yet ever soon once twice perhaps
maybe probably really actually especially however therefore though
although while until since unless whether here where why again always
never often sometimes usually together away around between through
during before against under above below behind inside outside without
within near far down off both each every few many much more less enough
several such myself yourself himself herself itself ourselves themselves
anyone anything everyone everything someone something nothing nobody
somebody everybody anywhere everywhere somewhere nowhere hello goodbye
yes please sorry thanks welcome okay oh ah wow hey hi monday tuesday
wednesday thursday friday saturday sunday january february march april
may june july august september october november december today tomorrow
yesterday tonight zero three four five six seven eight nine ten eleven
twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen
twenty thirty forty fifty sixty seventy eighty ninety hundred thousand
million billion english french german spanish chinese japanese american
british european african asian america england london paris france
germany china japan india russia europe australia canada mexico brazil
italy spain
""".split()


def plural_phones(phones):
    last = re.sub(r"\d", "", phones[-1])
    if last in SIBILANTS:
        return phones + ["IH0", "Z"]
    if last in VOICELESS:
        return phones + ["S"]
    return phones + ["Z"]


def past_phones(phones):
    last = re.sub(r"\d", "", phones[-1])
    if last in {"T", "D"}:
        return phones + ["IH0", "D"]
    if last in VOICELESS:
        return phones + ["T"]
    return phones + ["D"]


def _cvc_double(word: str) -> bool:
    """single-syllable consonant-vowel-consonant ending -> double the
    final letter before a vowel-initial suffix (stop -> stopped)."""
    if len(word) < 3 or len(word) > 4:
        return False
    c = word[-1]
    if c in VOWEL_LETTERS or c in "wxy":
        return False
    return word[-2] in VOWEL_LETTERS and word[-3] not in VOWEL_LETTERS


def plural_spelling(word: str) -> str:
    if re.search(r"(s|x|z|ch|sh)$", word):
        return word + "es"
    if re.search(r"[^aeiou]y$", word):
        return word[:-1] + "ies"
    return word + "s"


def past_spelling(word: str) -> str:
    if word.endswith("e"):
        return word + "d"
    if re.search(r"[^aeiou]y$", word):
        return word[:-1] + "ied"
    if _cvc_double(word):
        return word + word[-1] + "ed"
    return word + "ed"


def ing_spelling(word: str) -> str:
    if word.endswith("e") and not word.endswith("ee"):
        return word[:-1] + "ing"
    if _cvc_double(word):
        return word + word[-1] + "ing"
    return word + "ing"


def comparative(word: str, phones, kind: str):
    """kind in {er, est, ly}."""
    tail = {"er": ["ER0"], "est": ["AH0", "S", "T"], "ly": ["L", "IY0"]}[kind]
    if re.search(r"[^aeiou]y$", word):
        # happy -> happier/happiest/happily
        if kind == "ly":
            return word[:-1] + "ily", phones[:-1] + ["AH0", "L", "IY0"]
        return word[:-1] + "i" + kind, phones + tail
    if word.endswith("e") and kind in ("er", "est"):
        return word + kind[1:], phones + tail
    if _cvc_double(word) and kind in ("er", "est"):
        return word + word[-1] + kind, phones + tail
    return word + kind, phones + tail


def load_base(path: Path):
    lex = {}
    for line in path.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if not line or line.startswith(";"):
            continue
        parts = line.split("\t") if "\t" in line else line.split(None, 1)
        if len(parts) == 2:
            lex.setdefault(parts[0].lower(), parts[1].split())
    return lex


def expand(base):
    out = dict(base)
    no_expand = set(NO_EXPAND)

    def put(word, phones):
        out.setdefault(word, phones)

    for word, phones in base.items():
        if word in no_expand or len(word) < 3 or not word.isalpha():
            continue
        put(plural_spelling(word), plural_phones(phones))
        if word in VERBS:
            put(past_spelling(word), past_phones(phones))
            put(ing_spelling(word), phones + ["IH0", "NG"])
        if word in ADJS:
            for kind in ("er", "est", "ly"):
                w2, p2 = comparative(word, phones, kind)
                put(w2, p2)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    pkg = Path(__file__).resolve().parent.parent / "lightningfastspeech2_tpu"
    p.add_argument("--base", default=str(pkg / "data" / "lexicon_en.txt"))
    p.add_argument("--out",
                   default=str(pkg / "data" / "lexicon_en_expanded.txt"))
    args = p.parse_args(argv)

    base = load_base(Path(args.base))
    expanded = expand(base)
    lines = [
        "; Generated by scripts/build_lexicon.py from lexicon_en.txt —",
        "; base entries + regular inflections. Do not edit by hand.",
    ]
    for word in sorted(expanded):
        lines.append(f"{word}  {' '.join(expanded[word])}")
    Path(args.out).write_text("\n".join(lines) + "\n", encoding="utf-8")
    print(f"{len(base)} base entries -> {len(expanded)} expanded -> {args.out}")


if __name__ == "__main__":
    main()
