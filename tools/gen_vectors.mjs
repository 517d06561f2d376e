// Golden-vector generator: executes the REFERENCE source (type-stripped)
// in node and emits JSON vectors the Python kernel must match exactly.
//
// Reads: /root/reference/packages/orama/src/components/tokenizer/english-stemmer.ts
//        /root/reference/packages/orama/src/components/tokenizer/diacritics.ts
//        /root/reference/packages/orama/src/components/levenshtein.ts
//        /root/reference/packages/stopwords/lib/en.js
// Writes: tests/vectors/{stemmer,tokenizer,levenshtein}.json
//
// The tokenize() harness below mirrors tokenizer/index.ts:57-93 line by
// line (lower -> split -> normalize(stopword, stem, diacritics) ->
// filter -> trim -> dedupe).

import { readFileSync, writeFileSync, mkdirSync } from 'node:fs'
import { tmpdir } from 'node:os'
import { join } from 'node:path'

const REF = '/root/reference/packages/orama/src'

function stripTypes(src) {
  return src
    .replace(/^import type .*$/gm, '')
    .replace(/^import \{[^}]*\} from '\.\.\/\.\.\/types\.js'$/gm, '')
    .replace(/export type \w+ = \{[\s\S]*?\}\n/g, '')
    .replace(/: number\[\]\[\]/g, '')
    .replace(/: number\[\]/g, '')
    .replace(/: string\[\]/g, '')
    .replace(/\(term: string, word: string, tolerance: number\)/g, '(term, word, tolerance)')
    .replace(/\(term: string, w: string, tolerance: number\)/g, '(term, w, tolerance)')
    .replace(/\(a: string, b: string\)/g, '(a, b)')
    .replace(/\(charCode: number\)/g, '(charCode)')
    .replace(/\(str: string\)/g, '(str)')
    .replace(/: number(?![\w[])/g, '')
    .replace(/: Record<[^>]*>/g, '')
    .replace(/\(language: string \| undefined\)/g, '(language)')
    .replace(/^export type .*$/gm, '')
    .replace(/: string(?![\w[])/g, '')
    .replace(/: BoundedMetric/g, '')
}

async function loadRef(relPath, name) {
  const src = stripTypes(readFileSync(join(REF, relPath), 'utf8'))
  const f = join(tmpdir(), name + '.mjs')
  writeFileSync(f, src)
  return import(f)
}

const { stemmer } = await loadRef('components/tokenizer/english-stemmer.ts', 'english-stemmer')
const { replaceDiacritics } = await loadRef('components/tokenizer/diacritics.ts', 'diacritics')
const { syncBoundedLevenshtein } = await loadRef('components/levenshtein.ts', 'levenshtein')
const { stopwords } = await import('/root/reference/packages/stopwords/lib/en.js')

// ---- mirror of createTokenizer/tokenize for language=english ----------
const SPLIT_EN = /[^A-Za-zàèéìòóù0-9_'-]+/gim

function tokenizeRef(input, { stemming = false, stopWords = [] } = {}) {
  const stopSet = stopWords
  const normalize = (token) => {
    if (stopSet.includes(token)) return ''
    let t = token
    if (stemming) t = stemmer(t)
    return replaceDiacritics(t)
  }
  let tokens = input
    .toLowerCase()
    .split(SPLIT_EN)
    .map(normalize)
    .filter(Boolean)
  while (tokens[tokens.length - 1] === '') tokens.pop()
  while (tokens[0] === '') tokens.shift()
  return Array.from(new Set(tokens))
}

// ---- vectors -----------------------------------------------------------
mkdirSync('/root/repo/tests/vectors', { recursive: true })

// stemmer vectors: cover every rule branch + the step-4 -ion quirk
const stemWords = [
  'caresses', 'ponies', 'ties', 'caress', 'cats', 'feed', 'agreed',
  'plastered', 'bled', 'motoring', 'sing', 'conflated', 'troubled',
  'sized', 'hopping', 'tanned', 'falling', 'hissing', 'fizzed', 'failing',
  'filing', 'happy', 'sky', 'relational', 'conditional', 'rational',
  'valenci', 'hesitanci', 'digitizer', 'conformabli', 'radicalli',
  'differentli', 'vileli', 'analogousli', 'vietnamization', 'predication',
  'operator', 'feudalism', 'decisiveness', 'hopefulness', 'callousness',
  'formaliti', 'sensitiviti', 'sensibiliti', 'triplicate', 'formative',
  'formalize', 'electriciti', 'electrical', 'hopeful', 'goodness',
  'revival', 'allowance', 'inference', 'airliner', 'gyroscopic',
  'adjustable', 'defensible', 'irritant', 'replacement', 'adjustment',
  'dependent', 'adoption', 'communication', 'activation', 'homologou',
  'communism', 'activate', 'angulariti', 'homologous', 'effective',
  'bowdlerize', 'probate', 'rate', 'cease', 'controll', 'roll',
  'searching', 'searched', 'jumps', 'jumped', 'jumping', 'quickly',
  'lazy', 'dogs', 'foxes', 'running', 'ran', 'beautiful', 'tension',
  'decision', 'provision', 'division', 'yellow', 'young', 'yearly',
  'ying', 'by', 'a', 'an', 'is', 'the', 'engineer', 'engineering',
  'database', 'databases', 'indexes', 'indices', 'queries', 'querying',
  'distributed', 'distribution', 'partitioning', 'partitions',
  'shuffled', 'shuffles', 'aggregation', 'vectorization', 'national',
  'generalization', 'optimization', 'tokenizer', 'stemming',
]
const stemVectors = stemWords.map((w) => [w, stemmer(w)])
writeFileSync('/root/repo/tests/vectors/stemmer.json', JSON.stringify(stemVectors, null, 1))

// tokenizer vectors: both profiles over tricky strings
const texts = [
  'The quick brown fox jumps over the lazy dog',
  "I'm a self-driving car, and I don't stop!",
  'Hello, World! Hello again... hello HELLO',
  'café crème brûlée — naïve façade señor',
  'àèéìòóù ÀÈÉÌÒÓÙ',
  'foo_bar baz-qux 123 4x4 a1b2',
  '   leading and trailing   ',
  '',
  '!!!',
  "rock'n'roll don't-stop_now",
  'Tension and decisions in the provisional division',
  'databases indexes queries partitions distributed aggregation',
  'ÿŷźżž œŒ ß æÆ øØ þÞ ðÐ',
  'a-b-c a_b_c a.b.c a,b,c',
  'running runner runs ran',
  'The THE the tHe',
  'internationalization localization i18n l10n',
]
const tokVectors = []
for (const text of texts) {
  tokVectors.push({ text, profile: 'plain', tokens: tokenizeRef(text) })
  tokVectors.push({
    text,
    profile: 'full',
    tokens: tokenizeRef(text, { stemming: true, stopWords: stopwords }),
  })
}
writeFileSync('/root/repo/tests/vectors/tokenizer.json', JSON.stringify(tokVectors, null, 1))

// multi-language tokenizer vectors: every SPLITTERS regex from the
// reference (languages.ts:34-65), plain profile (language selects ONLY
// the splitter in Orama's default tokenizer; stemmers are opt-in)
const { SPLITTERS } = await loadRef('components/tokenizer/languages.ts', 'languages')

function tokenizeLang(input, language) {
  let tokens = input
    .toLowerCase()
    .split(SPLITTERS[language])
    .map((t) => replaceDiacritics(t))
    .filter(Boolean)
  while (tokens[tokens.length - 1] === '') tokens.pop()
  while (tokens[0] === '') tokens.shift()
  return Array.from(new Set(tokens))
}

const langTexts = {
  german: ['Die schnelle braune Füchsin springt über den faulen Hund! Straße, Größe & Co.',
           'Über ÄÖÜ äöü ß — 4x4 foo_bar'],
  french: ["L'été dernier, où étais-tu ? Cœur brûlé, naïve façade, déjà-vu!",
           'çà-et-là äâàéèëêïîöôùüûœç 123'],
  spanish: ['El niño pequeño comió mañana — ¿qué pasó? ¡Árbol útil!',
            'á-ú Á-Ú ñÑ üÜ 4x4'],
  italian: ["L'aquila vola già sull'altopiano però perché città",
            'àèéìòóù ÀÈÉÌÒÓÙ foo-bar'],
  portuguese: ['São Paulo é ótimo: ação, coração, vovô àquela hora',
               'à-ú À-Ú 4x4 a1b2'],
  russian: ['Быстрая коричневая лиса прыгает через ленивую собаку! Ёлка, её мёд.',
            'абв АБВ ёЁ 123 abc'],
  greek: ['Η γρήγορη καφέ αλεπού πηδά πάνω από το τεμπέλικο σκυλί! Ώρα ώρα.',
          'αβγ ΑΒΓ ά-ώ 123'],
  turkish: ['Hızlı kahverengi tilki tembel köpeğin üstünden atlar! Iğdır İstanbul.',
            'çğıöşü ÇĞIİÖŞÜ 123'],
  indonesian: ['Rubah cokelat cepat melompati anjing malas! 123 foo-bar_baz'],
  ukrainian: ['Швидка руда лисиця стрибає через ледачого пса! Київ, її, єдиний.'],
  czech: ['Rychlá hnědá liška skáče přes líného psa! Žluťoučký kůň úpěl ďábelské ódy.'],
  arabic: ['الثعلب البني السريع يقفز فوق الكلب الكسول 123 abc'],
}
const langVectors = []
for (const [language, texts2] of Object.entries(langTexts)) {
  for (const text of texts2) {
    langVectors.push({ language, text, tokens: tokenizeLang(text, language) })
  }
}
// FULL profile (stopwords + stemmer) vectors for the stemmed languages:
// the whole non-English pipeline end-to-end against the reference
const FULL_LOCALES = { german: 'de', french: 'fr', spanish: 'es', italian: 'it' }
for (const [language, code] of Object.entries(FULL_LOCALES)) {
  const { stemmer: st } = await import(`/root/reference/packages/stemmers/lib/${code}.js`)
  const { stopwords: sw } = await import(`/root/reference/packages/stopwords/lib/${code}.js`)
  const swSet = new Set(sw)
  for (const text of langTexts[language]) {
    let tokens = text
      .toLowerCase()
      .split(SPLITTERS[language])
      .map((t) => (swSet.has(t) ? '' : replaceDiacritics(st(t))))
      .filter(Boolean)
    while (tokens[tokens.length - 1] === '') tokens.pop()
    while (tokens[0] === '') tokens.shift()
    langVectors.push({ language, profile: 'full', text, tokens: Array.from(new Set(tokens)) })
  }
}
writeFileSync('/root/repo/tests/vectors/tokenizer_langs.json', JSON.stringify(langVectors, null, 1))

// Snowball stemmer vectors for de/fr/es/it: run the reference's
// compiled stemmers (packages/stemmers/lib/*.js) over suffix-family
// word lists; the Python kernel implements the published Snowball
// algorithms and must match every vector.
const langStemWords = {
  de: ['aufeinander', 'kategorien', 'können', 'größe', 'verschiedenen',
    'bedeutung', 'wichtigkeit', 'möglichkeit', 'freundlichkeit',
    'verständnis', 'verständnisse', 'erlebnisse', 'geheimnis',
    'geheimnisse', 'häuser', 'mädchen', 'schönheit', 'arbeiten',
    'arbeitet', 'gearbeitet', 'schnellsten', 'schnellste', 'laufen',
    'läufst', 'kleidung', 'zeitung', 'zeitungen', 'regierung',
    'darstellung', 'einzig', 'wenig', 'wenige', 'könig', 'honig',
    'fertig', 'fertigkeit', 'richtig', 'richtigkeit', 'freundlich',
    'natürlich', 'sachlich', 'endlich', 'beweglich', 'beweglichkeit',
    'brauchbarkeit', 'ausbildung', 'entscheidungen', 'bücher', 'füße',
    'straße', 'strassen', 'messen', 'wissen', 'wissenschaft',
    'wissenschaftlich', 'deutschland', 'deutschen', 'gutes', 'gute',
    'guten', 'gutem', 'guter', 'bestes', 'jahren', 'jahres', 'kindern',
    'kindes', 'bauer', 'bauern', 'treuer', 'steuern', 'bayern',
    'heimlich', 'heimlichkeiten', 'unkeuschheit', 'armes', 'ärmsten',
    'tischen', 'tisches', 'quaken', 'quakst', 'es', 'em', 'e', 'aß'],
  fr: ['continuellement', 'majestueusement', 'possibilités',
    'conditionnellement', 'nationalité', 'nationalités', 'émotion',
    'émotions', 'importance', 'importantes', 'logiciels', 'travaillons',
    'mangeaient', 'finissions', 'chanterions', 'aimerait', 'parlant',
    'parlante', 'parlants', 'étudiants', 'création', 'créations',
    'heureusement', 'heureuse', 'heureux', 'sérieusement', 'production',
    'productrice', 'absolument', 'arguments', 'montrèrent', 'allèrent',
    'venir', 'viennent', 'tiennent', 'châteaux', 'journaux', 'yeux',
    'travaux', 'cheveux', 'beautés', 'qualité', 'qualités', 'facilité',
    'activités', 'actifs', 'active', 'actrice', 'acteurs', 'lecteurs',
    'lectrice', 'libération', 'libérations', 'établissement',
    'établissements', 'agrandissement', 'amoureuses', 'curieuses',
    'évidemment', 'couramment', 'prudemment', 'connaître', 'paraît',
    'mangées', 'donnée', 'données', 'jouées', 'identification',
    'simplification', 'copieusement', 'abattement', 'abaissement',
    'iraient', 'finiraient', 'humainement', 'ennuyeuse', 'joyeux',
    'payer', 'employer', 'nettoyer', 'pitié', 'amitié', 'entière'],
  es: ['generosamente', 'comunicación', 'comunicaciones', 'universidad',
    'universidades', 'felicidad', 'rápidamente', 'trabajando',
    'trabajadores', 'cantando', 'cantaban', 'cantaríamos', 'viviendo',
    'vivieron', 'comieron', 'habilidades', 'capacidades', 'importante',
    'importancia', 'lógica', 'lógicamente', 'amorosa', 'amorosamente',
    'niñas', 'niños', 'señores', 'señoras', 'corazones', 'canciones',
    'región', 'regiones', 'religión', 'religiones', 'creencias',
    'ansiedad', 'realidades', 'realizar', 'realización',
    'organizaciones', 'programas', 'problemas', 'sistemas', 'análisis',
    'crisis', 'jóvenes', 'fáciles', 'difíciles', 'guitarras',
    'llegaron', 'quedándose', 'dándoselo', 'yendo', 'estuvieron',
    'tuvieron', 'pudieron', 'quisieron', 'amorosos', 'durmiendo',
    'atracción', 'atractivo', 'adormecimiento', 'agradecimientos',
    'enriquecimiento', 'torería', 'chillería', 'pensamiento', 'haciéndolo'],
  it: ['velocemente', 'felicemente', 'nazionale', 'nazionalità',
    'comunicazione', 'comunicazioni', 'lavorando', 'lavoratori',
    'cantando', 'cantavano', 'canterebbero', 'mangiando', 'mangiarono',
    'bellissimo', 'bellissima', 'grandissimi', 'probabilmente',
    'possibilità', 'università', 'città', 'qualità', 'attività',
    'amichevole', 'amichevolmente', 'ragazzi', 'ragazze', 'bambini',
    'bambine', 'uomini', 'azioni', 'azione', 'produzione', 'produzioni',
    'organizzazione', 'usando', 'usato', 'usati', 'parlavano',
    'parlerò', 'dormivano', 'leggendo', 'scrivendo', 'scrissero',
    'vissero', 'finirono', 'capirono', 'logicamente', 'semplicemente',
    'specialmente', 'ovviamente', 'abilità', 'felicità', 'abbandonerebbero',
    'indipendentemente', 'irresponsabilità', 'giocherellone', 'guardandoglielo',
    'pericolosamente', 'meravigliosamente', 'internazionalizzazione'],
}
langStemWords.ru = ['работами', 'книгой', 'говорившись', 'быстрейший',
  'красивые', 'человечество', 'деревьях', 'учительницами', 'величайшему',
  'зелёный', 'бежать', 'спрашивают', 'написанный', 'интереснейших',
  'правительственного', 'возможностями', 'остановиться', 'пользовательский']
langStemWords.pt = ['nacionalidade', 'comunicações', 'universidades',
  'felicidade', 'rapidamente', 'trabalhadores', 'organizações', 'chegaram',
  'construções', 'corações', 'meninas', 'logias', 'amorosamente',
  'habilíssimo', 'cantaríamos', 'vivêssemos', 'importantes', 'realização']
langStemWords.nl = ['werkzaamheden', 'boeken', 'snelheden', 'mogelijkheden',
  'grootste', 'kinderen', 'vriendelijke', 'landelijke', 'lichamelijk',
  'schrijvende', 'bewegingen', 'vrijheid', 'gemeenten', 'huizen', 'loopbaar',
  'spreekbaar', 'gekkigheid', 'aandoeningen']
langStemWords.dk = ['arbejderne', 'hurtigst', 'kærligheden', 'mulighederne',
  'vigtigste', 'venlighed', 'børnene', 'husets', 'løbende', 'smukkeste',
  'indvendigst', 'storhedens']
langStemWords.no = ['arbeiderne', 'hurtigst', 'kjærligheten', 'mulighetene',
  'viktigste', 'vennlighet', 'barna', 'husets', 'løpende', 'vakreste',
  'storhetens', 'hetslov', 'bokerte']
langStemWords.se = ['arbetarna', 'snabbaste', 'kärleken', 'möjligheterna',
  'viktigaste', 'vänlighet', 'barnen', 'husets', 'springande', 'vackraste',
  'storhetens', 'fullt', 'löst']
langStemWords.ro = ['lucrează', 'cântaţi', 'copilului', 'naţionalitate',
  'comunicaţie', 'posibilitati', 'activitate', 'iubirea', 'vorbeşte',
  'românesc', 'lucrătoare', 'abilitati', 'frumoasă', 'copiii',
  'mâncarea', 'scriitori', 'xsesem', 'cititati', 'scrie', 'lucrici']
langStemWords.hu = ['munkánk', 'házakban', 'gyerekeknek', 'szépséges',
  'könyvtárból', 'barátaimmal', 'lehetőségeket', 'asztalon', 'emberek',
  'kertjeinkben', 'babáé', 'almákat', 'vízzel', 'kertté', 'munkástul',
  'házánként', 'emberképpen']
langStemWords.fi = ['taloissa', 'kirjojen', 'nopeasti', 'juoksemme',
  'kauneimmat', 'mahdollisuuksien', 'suurempi', 'pienikin', 'pöydällä',
  'ihmisille', 'lapsillemme', 'ystäväni', 'koulussaan', 'vesien',
  'maahan', 'tiellä', 'taloonsa', 'kirjaksi', 'taloton', 'pappaa']
const stemLangVectors = []
for (const [code, words] of Object.entries(langStemWords)) {
  const { stemmer: st } = await import(`/root/reference/packages/stemmers/lib/${code}.js`)
  for (const w of words) stemLangVectors.push({ language: code, word: w, stem: st(w) })
}
writeFileSync('/root/repo/tests/vectors/stemmer_langs.json', JSON.stringify(stemLangVectors, null, 1))

// levenshtein vectors: prefix special cases + DP + early-exit edges
const levCases = []
const pairs = [
  ['fox', 'fox', 0], ['fox', 'fox', 1], ['fx', 'fox', 1], ['fx', 'fox', 0],
  ['dg', 'dog', 2], ['dg', 'dog', 1], ['fox', 'f', 1], ['fox', 'f', 2],
  ['f', 'fox', 0], ['f', 'fox', 1], ['fo', 'fox', 0], ['fo', 'fox', 5],
  ['fox', 'box', 1], ['fox', 'box', 0], ['abc', 'xyz', 2], ['abc', 'xyz', 3],
  ['', 'abc', 2], ['', 'abc', 3], ['abc', '', 2], ['abc', '', 3],
  ['kitten', 'sitting', 3], ['kitten', 'sitting', 2],
  ['saturday', 'sunday', 3], ['saturday', 'sunday', 2],
  ['search', 'searching', 0], ['searching', 'search', 3], ['searching', 'search', 2],
  ['word', 'wrd', 1], ['word', 'wort', 1], ['word', 'word', -1],
  ['prefix', 'pre', 3], ['pre', 'prefix', 0], ['ab', 'ba', 1], ['ab', 'ba', 2],
]
for (const [t, w, tol] of pairs) {
  const r = syncBoundedLevenshtein(t, w, tol)
  levCases.push({ term: t, word: w, tolerance: tol, distance: r.distance, isBounded: r.isBounded })
}
writeFileSync('/root/repo/tests/vectors/levenshtein.json', JSON.stringify(levCases, null, 1))

console.log('vectors written:', stemVectors.length, 'stem,', tokVectors.length, 'tok,', levCases.length, 'lev')
