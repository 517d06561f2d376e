// Differential-fuzz helper: run the REFERENCE's compiled stemmer for one
// language over a word list and print the stems as JSON, one run per
// invocation. The Python side (tools/fuzz_stemmers.py) generates the
// word lists, runs this, and compares against orama_spark.kernel.
//
//   node tools/fuzz_stemmers.mjs <lang-code> <words.txt>
//
// lang-code is the reference's file code (de/fr/.../tr/ar/...), see
// /root/reference/packages/stemmers/lib/.
import { readFileSync } from 'node:fs'

const [lang, wordsFile] = process.argv.slice(2)
const { stemmer } = await import(`/root/reference/packages/stemmers/lib/${lang}.js`)
// Per-word try/catch: the reference's bg.js THROWS on words hitting its
// letter-substitution branches (strict-mode assignment to a string
// index — the Lucene original mutated a char[]). A throw maps to null
// so the Python side can score those words separately.
const words = readFileSync(wordsFile, 'utf8').split('\n').filter((w) => w.length)
const out = words.map((w) => {
  try {
    return stemmer(w)
  } catch {
    return null
  }
})
process.stdout.write(JSON.stringify(out))
