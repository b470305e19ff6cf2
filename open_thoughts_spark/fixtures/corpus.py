"""Template banks for the deterministic transcripts fixture.

Shared between the distributed fixture generator (fixtures/transcripts.py),
the perplexity model's training corpus (functions/perplexity.py trains on
CLEAN_SENTENCES only, so clean strata score low and junk scores high) and the
language-ID marker design. Strata follow FIXTURES.md; reference citations for
each stratum live there.

Everything here is plain data — no external downloads, seed-free.
"""

from __future__ import annotations

# Stratum 1 — clean English prose (majority class; passes every filter).
CLEAN_SENTENCES: list[str] = [
    "The quick brown fox jumps over the lazy dog near the quiet river bank.",
    "She finished the report early and went for a long walk in the park.",
    "Our team shipped the new release after weeks of careful testing and review.",
    "The weather in the mountains was clear, and the trail was easy to follow.",
    "He explained the algorithm step by step until everyone understood it well.",
    "The museum opened a new exhibit about the history of printing and paper.",
    "They planted tomatoes and basil in the garden behind the old stone house.",
    "A good night of sleep makes the next day of work far more productive.",
    "The train arrived on time, and we found our seats without any trouble.",
    "Reading a little every day is the simplest way to learn something new.",
    "The committee agreed to fund the library expansion for another two years.",
    "After dinner we played cards and talked about plans for the summer trip.",
    "The engineer traced the fault to a loose cable behind the server rack.",
    "Fresh bread from the corner bakery is the best part of Saturday morning.",
    "The students presented their projects and answered questions from the panel.",
    "A steady routine of practice turned the beginner into a confident player.",
    "The harbor was full of small boats waiting for the wind to pick up.",
    "We compared the two proposals and chose the one with lower running costs.",
    "The documentary follows three farmers through a full year of seasons.",
    "Careful notes during the meeting saved us hours of follow-up questions.",
    "The new policy takes effect next month and applies to all departments.",
    "Morning light filled the kitchen while the coffee slowly brewed.",
    "The editor suggested a shorter title and a clearer opening paragraph.",
    "Volunteers cleaned the beach and sorted the litter for recycling.",
    "The bridge was repaired ahead of schedule and under the planned budget.",
    "Simple tools, used well, often beat complex tools used badly.",
    "The choir rehearsed twice a week in the hall beside the old church.",
    "Travel teaches patience in a way that few other things can.",
    "The recipe calls for two eggs, a cup of flour, and a pinch of salt.",
    "Clear writing is mostly the result of clear thinking and honest editing.",
    "The survey results show that most users prefer the simpler layout.",
    "By noon the market was busy with vendors selling fruit and flowers.",
    "The coach praised the team for staying calm in the final minutes.",
    "A small change to the cache settings doubled the speed of the site.",
    "The lecture covered the causes and effects of the industrial revolution.",
    "They repainted the fence and fixed the gate before the rain arrived.",
    "Honest feedback, given kindly, is one of the most useful gifts.",
    "The pilot checked the instruments twice before starting the engines.",
    "Archiving old records freed enough space for the next two years.",
    "The children built a small dam of stones across the shallow stream.",
]

# Stratum 2 — non-English turns (deterministic templates; each contains the
# langid marker stopwords for its language).
NON_ENGLISH: dict[str, list[str]] = {
    "es": [
        "El informe que preparamos es una guía clara para el equipo y para los clientes.",
        "La reunión de la semana pasada fue muy útil para el proyecto y por una buena razón.",
        "Los resultados que vimos son buenos y una parte del plan ya está lista para el lanzamiento.",
        "Es importante que el equipo revise los datos como parte del proceso para una entrega segura.",
    ],
    "de": [
        "Der Bericht ist fertig und die Ergebnisse sind gut für das ganze Team und ein guter Anfang.",
        "Die Besprechung war nicht lang und das Protokoll ist schon mit einer Liste der Aufgaben fertig.",
        "Das neue System ist schnell und die Kosten sind nicht hoch für eine Lösung mit dieser Qualität.",
        "Ein gutes Ergebnis ist wichtig und der Plan ist mit dem Team und für die Kunden abgestimmt.",
    ],
    "fr": [
        "Le rapport est prêt et les résultats sont bons pour le projet et pour vous aussi.",
        "La réunion de la semaine est utile et le plan est clair dans une version simple que vous avez.",
        "Les clients qui ont vu la démo sont contents et le produit est prêt pour une sortie rapide.",
        "C'est une bonne idée et le calendrier est clair pour vous et pour les équipes qui livrent.",
    ],
    "zh": [
        "这个项目的进展很顺利，团队下周会发布新的版本。",
        "请把会议记录整理好，然后发给所有相关的同事。",
        "数据分析的结果显示，新方案的效果明显更好。",
        "我们需要在月底之前完成测试，并准备发布说明。",
    ],
}

# Stratum 3 — boilerplate / refusal turns (WizardLM + Airoboros hits).
BOILERPLATE: list[str] = [
    "As an AI language model, I cannot help you with that request today.",
    "I'm sorry, but as a language model I do not have access to that information.",
    "As an AI assistant I must decline, since it violates my guidelines.",
    "My knowledge cutoff is September 2021, so I cannot provide newer data.",
    "Como modelo de lenguaje AI, no puedo responder a esa pregunta.",
    "I cannot fulfill your request because of my programming and my limitations.",
    "Apologies, this falls outside the limitations of my training data.",
    "Please note that as an AI I am unable to browse the internet for you.",
    "I can't help with that, but an AI language model can summarize public text.",
    "As a large language model trained by researchers, I cannot open files.",
]

# Stratum 4a — too short (<= 3 words, incl. empty for the 'empty' rule).
SHORT_TEXTS: list[str] = ["", "ok", "yes", "thanks", "sounds good", "sure thing", "no", "fine by me"]

# Stratum 6 — symbol-heavy / code-soup turns (plus url/[image] markers).
SYMBOL_TEXTS: list[str] = [
    "=== *** !!! ### $$$ %%% ^^^ &&& ((( ))) ___ +++ ~~~",
    "x = ({[]}) * &^%$#@! ; y = ~~|||~~ :: <> <> ??",
    "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) {{{{ }}}}",
    "see http://example.com/a?b=c&d=e for the [image] and ***notes*** !!!",
    "-->> ==>> <<== ||| ;;; ::: ... ,,, ''' \"\"\" ``` !!!",
]

# Stratum 7 — PII templates; {email} {phone} {key} substituted per-row.
PII_TEMPLATES: list[str] = [
    "You can reach me at {email} or call {phone} before five on weekdays.",
    "The service account key is {key} and the contact address is {email}.",
    "Call {phone} and ask for the invoice; send a copy to {email} as well.",
    "Use the token {key} for staging; production issues go to {phone}.",
    "Her address is {email}; his backup line is {phone} after business hours.",
]

# Stratum 8 — whitespace / control-char junk (normalization parity).
WSJUNK_TEXTS: list[str] = [
    "hello \t\t world \n\n this   has \x0b odd    spacing \x01 and junk",
    "  leading and trailing   spaces\t\tplus\ftabs and\rreturns  ",
    "line one\n\n\nline two\t \t line three \x02\x03 end  ",
    "many     spaces    between     every      word     here   ",
]

# Gibberish — high-perplexity letter soup (no symbols, no language markers)
# so only the perplexity rule can catch it.
GIBBERISH_TEXTS: list[str] = [
    "xqzwv jkqpf zzyyx qqvvb wkxjz pqzkv mjqxw zkvpq",
    "aGVsbG8gd2d9ybGQgdGhpcyBpcyBhIHRlc3Qgb2YgYmFzZTY0 vvkqz jjqxw pqmzv kkwjq",
    "qwkjx zpqvm xxjjw kqzpv wjxqk zzqqv pkxwj vqzkm qqwjx",
    "zzkwq vpxjq mkqzw jxqvp wwzkq xjvqp qkzwm pvxjq",
]

# Stratum 11 — exact duplicates (same text appears across many conv_ids).
DUP_TEXTS: list[str] = [
    "This exact sentence is duplicated across many conversations for dedup tests.",
    "Please remember to back up the database before the upgrade on Friday.",
    "The invoice was paid in full and the account is now settled.",
    "Release notes are drafted and waiting for a final round of review.",
    "The onboarding guide covers accounts, tooling, and the first week plan.",
]

# Stratum 12 — tool turns (JSON-ish payloads; must survive filtering).
TOOL_TEXTS: list[str] = [
    '{"tool": "search", "query": "spark window functions", "hits": 12}',
    '{"tool": "python", "stdout": "42", "exit_code": 0}',
    '{"tool": "browser", "url": "internal", "status": "ok", "elapsed_ms": 131}',
    '{"tool": "calculator", "expression": "2+2", "result": 4}',
]

TOOL_NAMES: list[str] = ["search", "python", "browser", "calculator"]

SYSTEM_TEXTS: list[str] = [
    "You are a helpful assistant that answers questions clearly and briefly.",
    "You are a careful planning assistant for a small engineering team.",
    "You are a support agent who resolves billing questions politely.",
]

# Sentences used to build > 150-word turns (clean words, varied).
LONG_FILLER: list[str] = CLEAN_SENTENCES[:12]

REPEATED_WORDS: list[str] = ["spam", "again", "loop", "echo"]
