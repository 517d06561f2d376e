"""Differential fuzz: orama_spark.kernel.cjk_dict.segment_dict vs
ICU's ``Intl.Segmenter`` (via the local Node.js, same ICU data the
reference tokenizers delegate to).

Generates deterministic mixed-script cases (dictionary words, OOV han,
katakana/hiragana runs incl. halfwidth forms and voicing marks,
fullwidth alnum, Latin, punctuation), segments each with both backends
and reports mismatches.  ``--fixture`` writes the (case, golden) pairs
to a JSON file for the hermetic pytest in tests/test_cjk_dict.py.

Usage: python tools/fuzz_cjk_icu.py [--n 6000] [--seed 7]
           [--fixture tests/fixtures/cjk_icu_golden.json]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NODE_SNIPPET = """
const fs = require('fs');
const [,, locale, inFile, outFile] = process.argv;
const lines = JSON.parse(fs.readFileSync(inFile, 'utf8'));
const seg = new Intl.Segmenter(locale, {granularity: 'word'});
const out = lines.map(s => {
  const all = [...seg.segment(s)];
  return [all.filter(x => x.isWordLike).map(x => x.segment),
          all.map(x => x.segment)];
});
fs.writeFileSync(outFile, JSON.stringify(out));
"""

CURATED = [
    "東京大学の研究者は自然言語処理を研究しています",
    "京都大学と大阪大学は関西の大学です",
    "すもももももももものうち",
    "私はコンピュータサイエンスを勉強しています",
    "日本経済新聞によると国際会議が開催された",
    "我们在北京大学学习计算机科学",
    "中华人民共和国成立于一九四九年",
    "自然语言处理是人工智能的重要领域",
    "上海是中国最大的城市之一",
    "分布式系统的设计与实现",
    # voicing-mark edge behaviors (pinned against ICU 78)
    "東京ﾟ大学", "路軌゚東京", "軌゙道", "ｶﾞｷｺﾞﾘ", "ﾎﾟｹｯﾄ",
    "はﾞな", "xﾟy", "GPUﾞ", "アﾟﾟイ", "ｶﾞﾞｷ", "あ゙い", "、ﾟア",
    "大学院ﾟ生", "自然ﾞ言語", "スーパﾟー", "ﾊﾟﾊﾟ",
    "弱々しい", "〆切と〇〇と々", "津々たる", "隅々まで",
]


def gen_cases(n: int, seed: int) -> list[str]:
    from orama_spark.kernel.cjk_dict import _load

    words = list(_load())
    rng = random.Random(seed)
    ja_words = [w for w in words if any(0x3041 <= ord(c) <= 0x30FF for c in w)]
    han_words = [w for w in words if all(0x4E00 <= ord(c) <= 0x9FFF for c in w)]
    iter_words = [w for w in words if any(c in "々〆〇" for c in w)]
    kata = [chr(c) for c in range(0x30A1, 0x30FB)]
    hira = [chr(c) for c in range(0x3041, 0x3097)]
    half_kata = [chr(c) for c in range(0xFF66, 0xFFA0)]  # incl. ﾞﾟ
    han = [chr(c) for c in range(0x4E00, 0x9FFF, 499)]
    ext_a = [chr(c) for c in range(0x3400, 0x4DBF, 777)]
    comb = ["゙", "゚"]
    punct = list("、。！？「」・，．（）：；")
    latin = ["hello", "GPU", "AI", "2024", "x86", "ＡＢＣ", "１２３"]

    def one() -> str:
        parts = []
        for _ in range(rng.randint(1, 14)):
            r = rng.random()
            if r < 0.26:
                parts.append(rng.choice(han_words))
            elif r < 0.44:
                parts.append(rng.choice(ja_words))
            elif r < 0.50:
                parts.append(rng.choice(iter_words))
            elif r < 0.60:
                parts.append("".join(rng.choice(kata)
                                     for _ in range(rng.randint(1, 26))))
            elif r < 0.66:
                parts.append("".join(rng.choice(hira)
                                     for _ in range(rng.randint(1, 6))))
            elif r < 0.71:
                parts.append("".join(rng.choice(half_kata)
                                     for _ in range(rng.randint(1, 6))))
            elif r < 0.74:
                parts.append(rng.choice(comb))
            elif r < 0.81:
                parts.append("".join(rng.choice(han)
                                     for _ in range(rng.randint(1, 10))))
            elif r < 0.84:
                parts.append("".join(rng.choice(ext_a)
                                     for _ in range(rng.randint(1, 3))))
            elif r < 0.92:
                parts.append(rng.choice(punct))
            else:
                parts.append(rng.choice(latin))
        return "".join(parts)

    return CURATED + [one() for _ in range(n)]


def icu_golden(cases: list[str], locale: str) -> list[list[str]]:
    with tempfile.TemporaryDirectory() as d:
        js = os.path.join(d, "seg.js")
        fin = os.path.join(d, "in.json")
        fout = os.path.join(d, "out.json")
        with open(js, "w") as f:
            f.write(NODE_SNIPPET)
        with open(fin, "w") as f:
            json.dump(cases, f)
        subprocess.run(["node", js, locale, fin, fout], check=True)
        with open(fout) as f:
            return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6000)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--fixture")
    args = ap.parse_args()

    from orama_spark.kernel.cjk_dict import segment_dict

    from orama_spark.kernel.cjk_dict import _cls, _MARKS

    def wordish(seg: str) -> bool:
        return any(_cls(c) is not None or c in _MARKS or c == "〆" for c in seg)

    cases = gen_cases(args.n, args.seed)
    total_bad = 0
    golden_ja = icu_golden(cases, "ja")
    for locale in ("ja", "zh-CN"):
        golden = golden_ja if locale == "ja" else icu_golden(cases, locale)
        bad, flag_anomaly = [], 0
        for s, (gw, gall) in zip(cases, golden):
            mine = segment_dict(s)
            if mine == gw:
                continue
            # ICU sometimes flags real words non-word-like around
            # iteration/voicing-mark corners; if the BOUNDARIES agree
            # (raw segments filtered by word-char content) the
            # divergence is the flag, not the segmentation.
            if mine == [g for g in gall if wordish(g)]:
                flag_anomaly += 1
                continue
            bad.append((s, gw, mine))
        print(f"{locale}: {len(cases) - len(bad) - flag_anomaly}/{len(cases)} "
              f"identical, {flag_anomaly} isWordLike-flag-only diffs, "
              f"{len(bad)} boundary mismatches")
        for s, g, m in bad[:10]:
            print("  CASE:", repr(s))
            print("   icu :", "|".join(g))
            print("   mine:", "|".join(m))
        total_bad += len(bad)
    if args.fixture:
        keep = cases[: len(CURATED) + 400]
        with open(args.fixture, "w") as f:
            json.dump(
                [[c, gw, gall] for c, (gw, gall) in zip(keep, golden_ja)],
                f, ensure_ascii=False, indent=0,
            )
        print(f"fixture: {len(keep)} cases -> {args.fixture}")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()
