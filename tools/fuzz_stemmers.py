"""Differential fuzz: orama_spark.kernel stemmers vs the REFERENCE's
compiled JS stemmers (run in node via tools/fuzz_stemmers.mjs).

Deterministic (seeded): per language, generate pseudo-words biased
toward the algorithm's suffix inventory (random root over the language
alphabet + 0-2 suffixes), plus pure-random strings for edge coverage,
then compare stem-for-stem.

    python tools/fuzz_stemmers.py [lang ...]   # default: all registered
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orama_spark.kernel.snowball import STEMMERS  # noqa: E402

# our language name -> reference lib/<code>.js
LANG_CODE = {
    "german": "de", "french": "fr", "spanish": "es", "italian": "it",
    "russian": "ru", "portuguese": "pt", "dutch": "nl", "danish": "dk",
    "norwegian": "no", "swedish": "se", "romanian": "ro",
    "hungarian": "hu", "finnish": "fi", "bulgarian": "bg",
    "sanskrit": "sk", "ukrainian": "uk", "turkish": "tr", "arabic": "ar",
    "greek": "gr", "indian": "in", "nepali": "np", "serbian": "rs",
    "tamil": "ta", "lithuanian": "lt", "irish": "ie", "armenian": "am",
    "indonesian": "id",
}

# root alphabets (lowercase; the tokenizer lowercases before stemming)
ALPHABETS = {
    "german": "abdefghiklmnorstuäöüß",
    "french": "abdefghilmnoprstuvéèêàâçï",
    "spanish": "abdefghilmnoprstuvzáéíóúñ",
    "italian": "abdefghilmnoprstuvzàèìòù",
    "russian": "абвгдежзиклмнопрстуфхцчшщыьэюя",
    "portuguese": "abdefghilmnoprstuvzãõçáéíóú",
    "dutch": "abdefghijklmnoprstuvwz",
    "danish": "abdefghiklmnoprstuvæøå",
    "norwegian": "abdefghiklmnoprstuvæøå",
    "swedish": "abdefghiklmnoprstuvåäö",
    "romanian": "abdefghilmnoprstuvzăâîșțşţ",
    "hungarian": "abdefghiklmnoprstuvzáéíóöőúüű",
    "finnish": "abdehijklmnoprstuvyäö",
    "bulgarian": "абвгдежзиклмнопрстуфхцчшщъьюя",
    "sanskrit": "abcdghijklmnprstvyāīūṛḥṃśṣṭḍṇñ",
    "ukrainian": "абвгдежзиклмнопрстуфхцчшщьюяіїє",
    "turkish": "abcçdefgğhıijklmnoöprsştuüvyz",
    "arabic": "ابتثجحخدذرزسشصضطظعغفقكلمنهويىءآأؤإئة",
    "greek": "αβγδεζηθικλμνξοπρστυφχψως",
    "indian": "अआइईउऊएऐओऔकखगघचछजझटठडढणतथदधनपफबभमयरलवशषसहिीुूेैोौंँ्ा",
    "nepali": "अआइईउऊएऐओऔकखगघचछजझटठडढणतथदधनपफबभमयरलवशषसहिीुूेैोौंँ्ा",
    "serbian": "abcdefghijklmnoprstuvzčćđšž",
    "tamil": "அஆஇஈஉஊஎஏஐஒஓகஙசஞடணதநபமயரலவழளறனிீுூெேைொோௌ்ா",
    "lithuanian": "abdegiklmnoprstuvyząčęėįšūųž",
    "irish": "abcdefghilmnoprstuáéíóú",
    "armenian": "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ",
    "indonesian": "abcdefghijklmnoprstuwy",
}

# suffix inventories to bias generation toward rule-firing shapes
SUFFIXES = {
    "bulgarian": ["ища", "ият", "ът", "то", "те", "та", "ия", "ят",
                  "овци", "ове", "еве", "ци", "зи", "си", "и", "я", "а",
                  "о", "е", "ен", "ъл", "ър"],
    "sanskrit": ["aḥ", "āḥ", "iḥ", "īḥ", "uḥ", "ūḥ", "am", "ām", "im",
                 "īm", "um", "ūm", "an", "ān", "in", "īn", "un", "ūn",
                 "as", "ās", "is", "īs", "us", "ūs"],
    "ukrainian": ["ивши", "ившись", "авши", "явшись", "ся", "сь", "ий",
                  "ими", "ої", "ою", "ого", "ому", "их", "іх", "ів",
                  "ій", "ім", "їй", "им", "іми", "йми", "ова", "ове",
                  "учи", "ячи", "ать", "ять", "али", "ати", "ити", "ме",
                  "ами", "ами", "еві", "ей", "ею", "єм", "єю", "їв",
                  "ием", "ию", "ия", "иям", "иях", "ові", "ой", "ом",
                  "ью", "ья", "ям", "ями", "ях", "ость", "ості", "ейше",
                  "нн", "ь", "и", "а", "е", "є", "у", "ю", "я"],
    "turkish": ["lar", "ler", "ları", "leri", "ın", "in", "un", "ün",
                "a", "e", "ı", "i", "u", "ü", "da", "de", "ta", "te",
                "dan", "den", "tan", "ten", "la", "le", "yla", "yle",
                "ki", "dır", "dir", "dur", "dür", "tır", "tir", "casına",
                "cesine", "ım", "im", "um", "üm", "sın", "sin", "sun",
                "sün", "ız", "iz", "uz", "üz", "sınız", "siniz", "lık",
                "lik", "sız", "siz", "yor", "mış", "miş", "muş", "müş",
                "dı", "di", "du", "dü", "tı", "ti", "tu", "tü", "ya",
                "ye", "yı", "yi", "yu", "yü", "nın", "nin", "nun", "nün",
                "ndan", "nden", "nda", "nde", "yken", "ken", "meksizin",
                "maksızın", "madık", "medik", "acak", "ecek"],
    "arabic": ["ال", "وال", "بال", "كال", "فال", "لل", "ها", "ان", "ات",
               "ون", "ين", "يه", "ية", "ه", "ة", "ي", "نا", "كم", "هم",
               "هن", "كن", "ا", "و", "تم", "وا", "تما", "ت", "ن", "أ",
               "است", "يست", "تست", "نست", "مست"],
    "greek": ["ος", "η", "ο", "οι", "ες", "ων", "ου", "α", "ας", "ες",
              "εις", "ει", "ειτε", "ουν", "ουμε", "ετε", "ονται",
              "ομαι", "εσαι", "εται", "ομαστε", "ηκα", "ηκες", "ηκε",
              "ησα", "ησες", "ησε", "ησαμε", "ησατε", "ησαν", "ωντας",
              "οντας", "ισμα", "ισματα", "ικος", "ικη", "ικο", "ικα",
              "ακι", "ακια", "ιτσα", "ουλα", "ωτερος", "οτερος",
              "οτατος", "ωτατος", "τητα", "τητας"],
    "indian": ["ों", "ें", "ोगे", "ोगी", "ाऊंगा", "ाऊंगी", "े", "ी",
               "ा", "ि", "ु", "ू", "ने", "नी", "ना", "ते", "ती", "ता",
               "ाँ", "ां", "ो", "ें", "ये", "कर", "ाकर", "ाइए", "ाईं",
               "ाया", "ेगी", "ेगा", "ोगी", "ाने", "ाना", "ाते", "ाती",
               "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", "ुआं"],
    "nepali": ["मा", "को", "ले", "लाई", "बाट", "हरु", "हरुमा", "हरुको",
               "छ", "छन्", "छु", "न्छ", "न्छन्", "ेका", "ेकी", "ेको",
               "ाउने", "ाएको", "ाएका", "िएको", "दै", "ेर", "ीकन", "ौं",
               "ौँ", "िन्", "ँदै", "ेछ", "नु", "ने", "ि", "ी", "ै"],
    "serbian": ["ovima", "ama", "ima", "ske", "ski", "sko", "ost",
                "osti", "enje", "enja", "anje", "anja", "ica", "ice",
                "ao", "io", "uo", "ila", "ilo", "ili", "ala", "alo",
                "ali", "ujem", "uješ", "uje", "ujemo", "ujete", "uju",
                "iti", "ati", "eti", "em", "eš", "e", "emo", "ete", "u",
                "a", "i", "o", "om", "og", "oj", "ih", "im", "ima",
                "ija", "ije", "iju", "čki", "ćki", "ška", "nja"],
    "tamil": ["கள்", "ை", "இல்", "உடன்", "ோடு", "ுக்கு", "ின்",
              "ால்", "ுடைய", "ிலிருந்து", "ும்", "ாக", "ான", "ில்",
              "த்தில்", "த்தை", "த்தின்", "ங்கள்", "ார்", "ான்",
              "ாள்", "து", "கிறது", "கிறான்", "கிறார்", "ந்தது",
              "ந்தான்", "வது", "ப்பட்ட", "ப்படும்", "ட்டும்",
              "வில்லை", "ாமல்", "ிய", "ே", "ா", "ோ"],
    "lithuanian": ["as", "is", "us", "ys", "ai", "ų", "ams", "ui",
                   "uose", "ose", "ė", "os", "oms", "a", "ą", "ę", "į",
                   "ti", "ia", "io", "iui", "iai", "iams", "iuose",
                   "imas", "imo", "imą", "imai", "yti", "auti", "uoti",
                   "ėti", "inti", "inėti", "čiau", "tume", "site",
                   "davo", "iausias", "esnis", "iausia"],
    "irish": ["acht", "eacht", "acht", "arcachta", "eachta", "achta",
              "óg", "eog", "óga", "anna", "anna", "aí", "í", "ín",
              "íní", "tha", "the", "the", "ta", "te", "adh", "eadh",
              "istin", "in", "áil", "eáil", "úil", "iúil", "mhar",
              "armhar", "amh", "eamh", "aibh", "ibh", "ach", "each"],
    "armenian": ["ներ", "եր", "ու", "ի", "ն", "ը", "ում", "ից", "ով",
                 "ներում", "ների", "ներին", "ներից", "ներով", "ական",
                 "ություն", "ության", "ությամբ", "ելու", "ալու", "ել",
                 "ալ", "ված", "ում", "եցին", "եցիր", "եցի", "ացին",
                 "ենք", "եք", "ես", "եմ", " անք", "աք", "աս", "ամ"],
    "indonesian": ["kah", "lah", "pun", "ku", "mu", "nya", "i", "kan",
                   "an", "meng", "men", "me", "peng", "pen", "pe",
                   "di", "ter", "ke", "ber", "per", "se"],
    "russian": ["ами", "ями", "ой", "ей", "ость", "ости", "ейший",
                "ейшая", "ться", "лся", "вший", "нный", "ение", "ения"],
}

# a few languages attach prefixes instead (Indonesian, Arabic)
PREFIXES = {
    "indonesian": ["meng", "men", "mem", "me", "peng", "pen", "pem",
                   "pe", "di", "ter", "ke", "ber", "bel", "per", "pel",
                   "se", ""],
    "arabic": ["ال", "وال", "بال", "كال", "فال", "لل", "و", "ف", "ب",
               "ك", "ل", "س", "سي", "ست", "سن", "سا", "است", "ا", ""],
}


def gen_words(lang: str, n: int = 6000, seed: int = 42) -> list[str]:
    rng = random.Random(f"{lang}-{seed}")
    alpha = ALPHABETS[lang]
    sufs = SUFFIXES.get(lang, [""])
    prefs = PREFIXES.get(lang, [""])
    words = set()
    while len(words) < n:
        root = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
        w = root
        if prefs != [""] and rng.random() < 0.6:
            w = rng.choice(prefs) + w
        if rng.random() < 0.85:
            w += rng.choice(sufs)
        if rng.random() < 0.35:
            w += rng.choice(sufs)
        words.add(w)
    return sorted(words)


def fuzz(lang: str, n: int = 6000) -> int:
    code = LANG_CODE[lang]
    words = gen_words(lang, n)
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(words))
        path = f.name
    try:
        out = subprocess.run(
            ["node", os.path.join(os.path.dirname(__file__), "fuzz_stemmers.mjs"),
             code, path],
            capture_output=True, text=True, check=True,
        ).stdout
    finally:
        os.unlink(path)
    expected = json.loads(out)
    st = STEMMERS[lang]
    bad = 0
    threw = 0
    for w, exp in zip(words, expected):
        if exp is None:
            # the reference stemmer THREW on this word (known: bg's
            # strict-mode string-mutation bug) — no output to match;
            # just require ours not to crash.
            st(w)
            threw += 1
            continue
        got = st(w)
        if got != exp:
            bad += 1
            if bad <= 10:
                print(f"  MISMATCH {lang}: {w!r} -> ref {exp!r}, ours {got!r}")
    extra = f" ({threw} ref-throws skipped)" if threw else ""
    print(f"{lang}: {len(words)} words, {bad} mismatches{extra}")
    return bad


if __name__ == "__main__":
    langs = sys.argv[1:] or sorted(set(STEMMERS) & set(LANG_CODE))
    total_bad = 0
    for lang in langs:
        if lang not in STEMMERS:
            print(f"{lang}: NOT IMPLEMENTED")
            total_bad += 1
            continue
        total_bad += fuzz(lang)
    sys.exit(1 if total_bad else 0)
