"""Generate data/frequency_dict_en_full.txt — a realistic-SCALE symspell
frequency dictionary (10k+ entries, `word count` per line, count-desc)
standing in for symspellpy's bundled frequency_dictionary_en_82_765.txt
(the reference loads that file at utils/spell_check_utils.py:14-23; the
82k-word original is not vendorable here, so we synthesize one at the
same order of magnitude).

Fully deterministic: a curated core of common English stems (public
knowledge) expanded through regular English morphology (plurals, -ed,
-ing, -er/-est, -ly, -ness, -ment, agentive -er, re-/un- prefixes) with
explicit irregular-verb forms so the expansion does not emit "goed".
Counts follow a Zipf law over a deterministic ordering, matching the
shape real corpus-frequency lists have (so beam search's
frequency-ranked candidate picks behave like they would on the real
file).

Usage: python tools/make_frequency_dict.py   # rewrites the data file
"""

from __future__ import annotations

import os

# ---- curated stems (common-English core; public knowledge) ------------

FUNCTION_WORDS = """
the of and to in a is that for it as was with be by on not he i this are
or his from at which but have an they you were her she all would there
his what so up out if about who get them can only other new some could
time these two may then do first any my now such like our over man me
even most made after also did many before must through back years where
much your way well down should because each just those people mr how too
little state good very make world still own see men work long here both
between life being under never day same another know while last might us
great old year off come since against go came right used take three
himself few house use during without again place american around however
home small found mrs thought went say part once general high upon school
every don does got united left number course war until always away
something fact though water less public put think almost hand enough far
took head yet government system better set told nothing night end why
called didn eyes find going look asked later knew point next city
business case give group toward young let days true face door cut
finally third hope example hundred five four word whole
""".split()

NOUNS = """
account action activity age agency agreement air amount analysis animal
answer area argument army art article attention audience author
authority baby bank base basis beach bed benefit bird blood board boat
body book box boy brain branch bread break budget building bus camera
campaign capital car card care career cause cell center century chair
chance change chapter character charge check chest child choice church
citizen claim class climate club coach coast coffee college color
committee community company computer concept concern condition
conference congress connection consequence context contract control
conversation cost country county couple court cover credit crime
culture cup customer cycle dance data daughter deal death debate decade
decision defense degree demand department design detail development
device difference dinner direction director discussion disease distance
doctor dog dollar drama dream drive driver drug ear earth economy edge
editor education effect effort election element employee energy engine
environment equipment error event evidence exam exchange exercise
experience expert eye factor failure family farm father fear feature
field figure film finger fire firm fish flight floor flower food foot
force forest form frame friend front fruit fuel function future game
garden gas gift girl glass goal gold grade grass ground growth guard
guess guest guide gun guy hair half hall hand health heart heat height
hill history hole horse hospital hotel hour husband idea image impact
income industry information instance insurance interest internet
interview investment island issue item job judge juice key kid kind
king kitchen knee knife knowledge lab lady lake land language law
lawyer leader league leg length lesson letter level library light line
link lip list literature location loss lot love lunch machine magazine
mail majority manager map march market marriage match material math
matter meal meaning measure meat media medicine meeting member memory
message metal method middle mind minute mirror mission mistake model
moment money month morning mother mountain mouth movie muscle music
name nation nature neck network news newspaper noise north note notice
novel object occasion ocean offer office officer oil operation opinion
option order organization owner page pain paint painting pair paper
parent park partner party passage past path patient pattern payment
peace percent performance period person phone photo phrase piece pilot
plan plane plant plate player poem poet police policy politics
population position possibility pot potato power practice president
pressure price principle priority prison problem process product
profession professor profit program project property protection
purpose quality quarter queen question radio rain range rate ratio
reader reality reason recipe record region relation religion report
research resource response restaurant result revenue review risk river
road rock role roof room rule safety salt sample scale scene schedule
science score screen sea season seat second secret secretary section
sector security sense sentence series service session shape share ship
shirt shoe shop shoulder side sign signal silver singer sister site
situation size skill skin sky society software soil soldier solution
son song sort sound source south space speaker speech speed spirit
sport spring staff stage standard star statement station status step
stock stomach store storm story strategy street stress structure
student studio study style subject success sugar summer sun surface
table target task tax tea teacher team technology television
temperature term test text theory thing title tool tooth top topic
town trade tradition traffic train transition travel treatment tree
trial trip truck truth type unit university user valley value variety
vehicle version video view village voice volume wall weather week
weight west wife wind window wine winter woman wood worker yard youth
zone
""".split()

VERBS = """
accept achieve act add admit advise affect afford agree aim allow
announce answer appear apply argue arrange arrive ask assume attack
attempt attend avoid base beat believe belong borrow bother build burn
call care carry cause change charge check claim clean clear climb close
collect compare complain complete confirm connect consider consist
contain continue contribute cook copy correct count cover create cross
cry damage dance decide declare deliver demand deny depend describe
deserve destroy develop disappear discover discuss divide dress drop
earn enable encourage enjoy enter examine exist expect experience
explain express extend face fail fasten fill finish fit fix fold follow
force form gain gather generate glance grab grant greet guess handle
happen hate head help hire hold hope identify ignore imagine improve
include increase indicate influence inform intend introduce invite
involve join jump kick kill kiss knock land last laugh learn like limit
listen live load lock look manage mark matter measure mention mind miss
mix move name need note notice obtain occur offer open order own pack
paint pass perform pick place plan play point prefer prepare present
press prevent produce promise protect prove provide pull push raise
reach realize receive recognize record reduce refer reflect refuse
regard relate release remain remember remind remove repeat replace
reply report represent request require rest return reveal roll rush
save seem select serve settle share shout sign smile sort sound start
state stay stop stretch study succeed suffer suggest supply support
suppose survive talk tend test thank touch train travel treat trust
turn visit wait walk want warn wash watch wave wish wonder work worry
""".split()

IRREGULAR = {
    # base: (past, past-participle, gerund, 3sg)
    "be": ("was", "been", "being", "is"),
    "become": ("became", "become", "becoming", "becomes"),
    "begin": ("began", "begun", "beginning", "begins"),
    "break": ("broke", "broken", "breaking", "breaks"),
    "bring": ("brought", "brought", "bringing", "brings"),
    "buy": ("bought", "bought", "buying", "buys"),
    "catch": ("caught", "caught", "catching", "catches"),
    "choose": ("chose", "chosen", "choosing", "chooses"),
    "come": ("came", "come", "coming", "comes"),
    "do": ("did", "done", "doing", "does"),
    "draw": ("drew", "drawn", "drawing", "draws"),
    "drink": ("drank", "drunk", "drinking", "drinks"),
    "drive": ("drove", "driven", "driving", "drives"),
    "eat": ("ate", "eaten", "eating", "eats"),
    "fall": ("fell", "fallen", "falling", "falls"),
    "feel": ("felt", "felt", "feeling", "feels"),
    "fight": ("fought", "fought", "fighting", "fights"),
    "find": ("found", "found", "finding", "finds"),
    "fly": ("flew", "flown", "flying", "flies"),
    "forget": ("forgot", "forgotten", "forgetting", "forgets"),
    "get": ("got", "gotten", "getting", "gets"),
    "give": ("gave", "given", "giving", "gives"),
    "go": ("went", "gone", "going", "goes"),
    "grow": ("grew", "grown", "growing", "grows"),
    "have": ("had", "had", "having", "has"),
    "hear": ("heard", "heard", "hearing", "hears"),
    "hide": ("hid", "hidden", "hiding", "hides"),
    "keep": ("kept", "kept", "keeping", "keeps"),
    "know": ("knew", "known", "knowing", "knows"),
    "lead": ("led", "led", "leading", "leads"),
    "leave": ("left", "left", "leaving", "leaves"),
    "lose": ("lost", "lost", "losing", "loses"),
    "make": ("made", "made", "making", "makes"),
    "mean": ("meant", "meant", "meaning", "means"),
    "meet": ("met", "met", "meeting", "meets"),
    "pay": ("paid", "paid", "paying", "pays"),
    "put": ("put", "put", "putting", "puts"),
    "read": ("read", "read", "reading", "reads"),
    "ride": ("rode", "ridden", "riding", "rides"),
    "rise": ("rose", "risen", "rising", "rises"),
    "run": ("ran", "run", "running", "runs"),
    "say": ("said", "said", "saying", "says"),
    "see": ("saw", "seen", "seeing", "sees"),
    "sell": ("sold", "sold", "selling", "sells"),
    "send": ("sent", "sent", "sending", "sends"),
    "show": ("showed", "shown", "showing", "shows"),
    "sing": ("sang", "sung", "singing", "sings"),
    "sit": ("sat", "sat", "sitting", "sits"),
    "sleep": ("slept", "slept", "sleeping", "sleeps"),
    "speak": ("spoke", "spoken", "speaking", "speaks"),
    "spend": ("spent", "spent", "spending", "spends"),
    "stand": ("stood", "stood", "standing", "stands"),
    "take": ("took", "taken", "taking", "takes"),
    "teach": ("taught", "taught", "teaching", "teaches"),
    "tell": ("told", "told", "telling", "tells"),
    "think": ("thought", "thought", "thinking", "thinks"),
    "throw": ("threw", "thrown", "throwing", "throws"),
    "understand": ("understood", "understood", "understanding",
                   "understands"),
    "wear": ("wore", "worn", "wearing", "wears"),
    "win": ("won", "won", "winning", "wins"),
    "write": ("wrote", "written", "writing", "writes"),
}

ADJECTIVES = """
able active actual available aware bad basic beautiful big bitter black
blue bright broad brown busy calm capable careful certain cheap clean
clear clever cold comfortable common complete complex cool correct
crazy critical cultural current dangerous dark dead deep different
difficult direct dirty dry early easy economic effective efficient
empty entire equal exact expensive fair famous fast fat final fine firm
flat foreign formal free fresh friendly full funny general gentle
global glad good gray green happy hard healthy heavy helpful high
honest hot huge human hungry important impossible individual
interesting international kind large late legal light likely local
long loose loud low lucky mad major mental modern narrow national
natural necessary negative nervous nice normal obvious odd official
open original particular patient perfect personal physical plain
pleasant polite political poor popular positive possible powerful
practical pretty primary private professional proper proud pure quick
quiet rare raw ready real recent red regular rich rough round sad safe
secure senior serious sharp short sick significant silent similar
simple single slow smart smooth soft solid special specific strange
strict strong successful sudden sweet tall thick thin tight tiny tired
total tough traditional typical unique useful usual warm weak wet white
wide wild wise wrong yellow
""".split()

VOWELS = set("aeiou")


def plural(n: str) -> str:
    if n.endswith(("s", "x", "z", "ch", "sh")):
        return n + "es"
    if n.endswith("y") and n[-2] not in VOWELS:
        return n[:-1] + "ies"
    if n.endswith("f"):
        return n[:-1] + "ves"
    if n.endswith("fe"):
        return n[:-2] + "ves"
    return n + "s"


def _cvc_double(v: str) -> bool:
    """one-syllable-ish CVC ending → double the final consonant
    (stop→stopped). Heuristic: short word, consonant-vowel-consonant
    tail, final consonant not w/x/y."""
    return (len(v) <= 4 and len(v) >= 3 and v[-1] not in VOWELS
            and v[-1] not in "wxy" and v[-2] in VOWELS
            and v[-3] not in VOWELS)


def verb_forms(v: str) -> list[str]:
    if v in IRREGULAR:
        past, part, ger, third = IRREGULAR[v]
        return sorted({v, past, part, ger, third})
    stem = v
    if _cvc_double(v):
        stem = v + v[-1]
    if v.endswith("e") and not v.endswith("ee"):
        ed, ing = v + "d", v[:-1] + "ing"
    elif v.endswith("y") and v[-2] not in VOWELS:
        ed, ing = v[:-1] + "ied", stem + "ing"
    else:
        ed, ing = stem + "ed", stem + "ing"
    return sorted({v, plural(v), ed, ing})


def adj_forms(a: str) -> list[str]:
    out = {a}
    if a.endswith("y") and a[-2] not in VOWELS:
        out.add(a[:-1] + "ier")
        out.add(a[:-1] + "iest")
        out.add(a[:-1] + "ily")
        out.add(a[:-1] + "iness")
    elif len(a) <= 6:  # short adjectives take -er/-est
        stem = a + a[-1] if _cvc_double(a) else a
        if a.endswith("e"):
            out.add(a + "r")
            out.add(a + "st")
        else:
            out.add(stem + "er")
            out.add(stem + "est")
        out.add(a + "ly")
        out.add(a + "ness")
    else:  # long adjectives: periphrastic comparison; still -ly/-ness
        out.add(a + "ly")
        out.add(a + "ness")
    return sorted(out)


def build_entries() -> list[str]:
    """Deterministic ordered vocabulary: function-word core first (they
    get the Zipf head), then stems and inflections in curated order."""
    seen: dict[str, None] = {}

    def add(ws):
        for w in ws:
            w = w.strip().lower()
            if w and w.isalpha() and w not in seen:
                seen[w] = None

    add(FUNCTION_WORDS)
    add(NOUNS)
    add(VERBS)
    add(ADJECTIVES)
    for n in NOUNS:
        add([plural(n)])
    for v in VERBS:
        add(verb_forms(v))
    for b, forms in IRREGULAR.items():
        add([b, *forms])
    for a in ADJECTIVES:
        add(adj_forms(a))
    # agentive nouns and their plurals (teach→teacher→teachers)
    for v in VERBS:
        agent = (v + "r") if v.endswith("e") else \
            (v[:-1] + "ier") if v.endswith("y") and v[-2] not in VOWELS \
            else ((v + v[-1] + "er") if _cvc_double(v) else v + "er")
        add([agent, plural(agent)])
    # productive prefixes on verb families (re-, un-, over-, out-)
    for v in VERBS:
        if v in IRREGULAR:
            continue
        for pfx in ("re", "un", "over", "out"):
            add([pfx + f for f in verb_forms(v)])
    # -ment / -ation / -able nominalizations for -consonant verbs
    for v in VERBS:
        if v in IRREGULAR:
            continue
        add([v + "ment", plural(v + "ment")])
        stem = v[:-1] if v.endswith("e") else v
        add([stem + "ation", plural(stem + "ation"), stem + "able"])
    # un- on adjectives (unhappy, unfair) and their -ly adverbs
    for a in ADJECTIVES:
        add(["un" + a, "un" + a + "ly" if not a.endswith("y")
             else "un" + a[:-1] + "ily"])
    # -ful / -less denominal adjectives for short nouns (careful,
    # careless) — productive enough that real lists carry most of them
    for n in NOUNS:
        if len(n) <= 6 and not n.endswith("s"):
            add([n + "ful", n + "less"])
    return list(seen)


def main() -> None:
    words = build_entries()
    # Zipf counts over the deterministic order: count_i = C / (i+1)^s,
    # floor-clamped so the tail stays >= 10 like real symspell files
    c0, s = 22_000_000, 1.07
    lines = []
    for i, w in enumerate(words):
        cnt = max(10, int(c0 / ((i + 1) ** s)))
        lines.append(f"{w} {cnt}")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "frequency_dict_en_full.txt")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(words)} entries "
          f"(head={lines[0]!r}, tail={lines[-1]!r})")


if __name__ == "__main__":
    main()
