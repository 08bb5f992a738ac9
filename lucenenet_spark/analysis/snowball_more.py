"""Snowball stemmers + stop sets: Portuguese, Italian, Dutch.

Like `snowball.py` (de/fr/es), these reimplement the PUBLISHED Snowball
algorithms (snowballstem.org/algorithms/{portuguese,italian,dutch}/
stemmer.html) that the reference's machine-generated Tartarus classes
compile from (reference: src/Lucene.Net.Analysis.Common/Analysis/Pt/
PortugueseAnalyzer.cs, It/ItalianAnalyzer.cs, Nl/DutchAnalyzer.cs via
Tartarus Snowball). No reference code is consulted — only the public
algorithm descriptions. Each language plugs into the same
_SnowballAnalyzer batch-dictionary stemming chain and the
LanguageRoutedAnalyzer seam.

Fidelity notes: a handful of archaic second-person-plural Portuguese verb
forms may be absent from the step-2 among (documented subset); everything
else follows the classic editions rule-for-rule.
"""

from __future__ import annotations

from lucenenet_spark.analysis.snowball import _r_after, _SnowballAnalyzer

# ===========================================================================
# Portuguese
# ===========================================================================
PORTUGUESE_STOP_WORDS = frozenset("""
de a o que e do da em um para é com não uma os no se na por mais as dos
como mas foi ao ele das tem à seu sua ou ser quando muito há nos já está
eu também só pelo pela até isso ela entre era depois sem mesmo aos ter
seus quem nas me esse eles estão você tinha foram essa num nem suas meu
às minha têm numa pelos elas havia seja qual será nós tenho lhe deles
essas esses pelas este fosse dele tu te vocês vos lhes meus minhas teu
tua teus tuas nosso nossa nossos nossas dela delas esta estes estas
aquele aquela aqueles aquelas isto aquilo estou estamos estive esteve
estivemos estiveram estava estávamos estavam estivera estivéramos esteja
estejamos estejam estivesse estivéssemos estivessem estiver estivermos
estiverem hei hão houve houvemos houveram houvera houvéramos haja
hajamos hajam houvesse houvéssemos houvessem houver houvermos houverem
houverei houverá houveremos houverão houveria houveríamos houveriam sou
somos são fomos fora fôramos sejamos sejam fui fosse fôssemos fossem for
formos forem serei seremos serão seria seríamos seriam tem tém tinham
tive teve tivemos tiveram tivera tivéramos tenha tenhamos tenham tivesse
tivéssemos tivessem tiver tivermos tiverem terei terá teremos terão
teria teríamos teriam
""".split())

_PT_VOWELS = frozenset("aeiouáéíóúâêô")


def _pt_rv(w: str) -> int:
    """Same RV rule as Spanish (the two languages share the definition)."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _PT_VOWELS:
        for i in range(2, n):
            if w[i] in _PT_VOWELS:
                return i + 1
        return n
    if w[0] in _PT_VOWELS and w[1] in _PT_VOWELS:
        for i in range(2, n):
            if w[i] not in _PT_VOWELS:
                return i + 1
        return n
    return 3


_PT_STEP1 = sorted(
    [
        *[(s, "del_r2") for s in """eza ezas ico ica icos icas ismo ismos
          ável ível ista istas oso osa osos osas amento amentos imento
          imentos adora ador aça~o adoras adores aço~es ante antes
          ância""".split()],
        ("logia", "log"), ("logias", "log"),
        ("uça~o", "u"), ("uço~es", "u"),
        ("ência", "ente"), ("ências", "ente"),
        ("amente", "amente"), ("mente", "mente"),
        ("idade", "idade"), ("idades", "idade"),
        *[(s, "iv") for s in "iva ivo ivas ivos".split()],
        ("ira", "ir"), ("iras", "ir"),
    ],
    key=lambda x: -len(x[0]),
)

# verb suffixes, step 2 (delete if in RV, longest match). Classic edition
# list; the rare archaic 2nd-plural variants are the documented subset gap.
_PT_STEP2 = sorted("""
ada ida ia aria eria iria ará ara erá era irá ava asse esse isse aste
este iste ei arei erei irei am iam ariam eriam iriam aram eram iram avam
em arem erem irem assem essem issem ado ido ando endo indo ara~o era~o
ira~o ar er ir as adas idas ias arias erias irias arás aras erás eras
irás avas es ardes erdes irdes ares eres ires asses esses isses astes
estes istes is ais iais aríeis eríeis iríeis áreis areis éreis ereis
íreis ireis ásseis ésseis ísseis asseis esseis isseis áveis aveis ados
idos ámos amos íamos iamos aríamos ariamos eríamos eriamos iríamos
iriamos áramos aramos éramos eramos íramos iramos ávamos avamos emos
aremos eremos iremos ássemos assemos êssemos essemos íssemos issemos
imos armos ermos irmos eu iu ou ira iras
""".split(), key=len, reverse=True)


def portuguese_stem(word: str) -> str:
    """Snowball Portuguese stemmer (classic edition), rule-for-rule from
    the published description: ã/õ marked as a~/o~, RV/R1/R2 regions,
    step 1 standard suffixes, step 2 verb suffixes, step 3 c-preceded i,
    step 4 residual vowel, step 5 final e/é/ê + cedilla; marks restored."""
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    rv = _pt_rv(w)
    r1 = _r_after(w, 0, _PT_VOWELS)
    r2 = _r_after(w, r1, _PT_VOWELS)

    orig = w
    # ---- step 1: standard suffix removal (longest match, then its rule)
    for suf, act in _PT_STEP1:
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if act == "del_r2":
            if p >= r2:
                w = w[:p]
        elif act == "log":
            if p >= r2:
                w = w[:p] + "log"
        elif act == "u":
            if p >= r2:
                w = w[:p] + "u"
        elif act == "ente":
            if p >= r2:
                w = w[:p] + "ente"
        elif act == "amente":
            if p >= r1:
                w = w[:p]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and len(w) - 2 >= r2:
                            w = w[:-2]
                            break
        elif act == "mente":
            if p >= r2:
                w = w[:p]
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif act == "idade":
            if p >= r2:
                w = w[:p]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif act == "iv":
            if p >= r2:
                w = w[:p]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif act == "ir":
            if p >= rv and p > 0 and w[p - 1] == "e":
                w = w[:p] + "ir"
        break

    step1_changed = w != orig
    step2_changed = False
    if not step1_changed:
        # ---- step 2: verb suffixes (delete if in RV; the among is
        # limited to RV, so a straddling suffix falls through to a
        # shorter one wholly inside RV)
        for suf in _PT_STEP2:
            if w.endswith(suf):
                p = len(w) - len(suf)
                if p < rv:
                    continue
                w = w[:p]
                step2_changed = True
                break

    if step1_changed or step2_changed:
        # ---- step 3: i preceded by c, in RV
        if w.endswith("i") and len(w) - 1 >= rv and len(w) >= 2 and w[-2] == "c":
            w = w[:-1]
    else:
        # ---- step 4: residual suffix (os a i o á í ó), in RV
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf):
                if len(w) - len(suf) >= rv:
                    w = w[: -len(suf)]
                break

    # ---- step 5: final e/é/ê in RV; gu/ci undoubling; cedilla
    for suf in ("e", "é", "ê"):
        if w.endswith(suf):
            if len(w) - 1 >= rv:
                w = w[:-1]
                if (w.endswith("gu") or w.endswith("ci")) and len(w) - 1 >= rv:
                    w = w[:-1]
            break
    if w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


class PortugueseAnalyzer(_SnowballAnalyzer):
    """Analysis/Pt/PortugueseAnalyzer.cs analogue (stop set + Snowball
    Portuguese)."""

    _stem = staticmethod(portuguese_stem)

    def __init__(self, stopwords=PORTUGUESE_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


# ===========================================================================
# Italian
# ===========================================================================
ITALIAN_STOP_WORDS = frozenset("""
ad al allo ai agli all agl alla alle con col coi da dal dallo dai dagli
dall dagl dalla dalle di del dello dei degli dell degl della delle in
nel nello nei negli nell negl nella nelle su sul sullo sui sugli sull
sugl sulla sulle per tra contro io tu lui lei noi voi loro mio mia miei
mie tuo tua tuoi tue suo sua suoi sue nostro nostra nostri nostre vostro
vostra vostri vostre mi ti ci vi lo la li le gli ne il un uno una ma ed
se perché anche come dov dove che chi cui non più quale quanto quanti
quanta quante quello quelli quella quelle questo questi questa queste si
tutto tutti a c e i l o ho hai ha abbiamo avete hanno abbia abbiate
abbiano avrò avrai avrà avremo avrete avranno avrei avresti avrebbe
avremmo avreste avrebbero avevo avevi aveva avevamo avevate avevano ebbi
avesti ebbe avemmo aveste ebbero avessi avesse avessimo avessero avendo
avuto avuta avuti avute sono sei è siamo siete sia siate siano sarò
sarai sarà saremo sarete saranno sarei saresti sarebbe saremmo sareste
sarebbero ero eri era eravamo eravate erano fui fosti fu fummo foste
furono fossi fosse fossimo fossero essendo faccio fai facciamo fanno
faccia facciate facciano farò farai farà faremo farete faranno farei
faresti farebbe faremmo fareste farebbero facevo facevi faceva facevamo
facevate facevano feci facesti fece facemmo faceste fecero facessi
facesse facessimo facessero facendo sto stai sta stiamo stanno stia
stiate stiano starò starai starà staremo starete staranno starei
staresti starebbe staremmo stareste starebbero stavo stavi stava stavamo
stavate stavano stetti stesti stette stemmo steste stettero stessi
stesse stessimo stessero stando
""".split())

_IT_VOWELS = frozenset("aeiouàèìòù")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")

_IT_PRON = sorted(
    """ci gli la le li lo mi ne si ti vi sene gliela gliele glieli glielo
    gliene mela mele meli melo mene tela tele teli telo tene cela cele
    celi celo cene vela vele veli velo vene""".split(),
    key=len, reverse=True,
)

_IT_STEP1 = sorted(
    [
        *[(s, "del_r2") for s in """anza anze ico ici ica ice iche ichi
          ismo ismi abile abili ibile ibili ista iste isti istà istè istì
          oso osi osa ose mente atrice atrici ante anti""".split()],
        *[(s, "azione") for s in "azione azioni atore atori".split()],
        ("logia", "log"), ("logie", "log"),
        *[(s, "u") for s in "uzione uzioni usione usioni".split()],
        ("enza", "ente"), ("enze", "ente"),
        *[(s, "del_rv") for s in "amento amenti imento imenti".split()],
        ("amente", "amente"),
        ("ità", "ita"),
        *[(s, "iv") for s in "ivo ivi iva ive".split()],
    ],
    key=lambda x: -len(x[0]),
)

_IT_STEP2 = sorted("""
ammo ando ano are arono asse assero assi assimo ata ate ati ato ava
avamo avano avate avi avo emmo enda ende endi endo erà erai eranno ere
erebbe erebbero erei eremmo eremo ereste eresti erete erò erono essero
ete eva evamo evano evate evi evo Iamo iamo immo irà irai iranno ire
irebbe irebbero irei iremmo iremo ireste iresti irete irò irono isca
iscano isce isci isco iscono issero ita ite iti ito iva ivamo ivano
ivate ivi ivo ono uta ute uti uto ar ir
""".split(), key=len, reverse=True)


def _it_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _IT_VOWELS:
        for i in range(2, n):
            if w[i] in _IT_VOWELS:
                return i + 1
        return n
    if w[0] in _IT_VOWELS and w[1] in _IT_VOWELS:
        for i in range(2, n):
            if w[i] not in _IT_VOWELS:
                return i + 1
        return n
    return 3


def italian_stem(word: str) -> str:
    """Snowball Italian stemmer (classic edition), rule-for-rule from the
    published description: acute→grave, mark u-after-q and intervocalic
    u/i as consonants, RV/R1/R2, step 0 attached pronouns, step 1
    standard suffixes, step 2 verb suffixes, steps 3a/3b; unmark."""
    w = word.lower().translate(_IT_ACUTE)
    chars = list(w)
    for i in range(1, len(chars)):
        if chars[i] == "u" and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            chars[i] in "ui"
            and 0 < i < len(chars) - 1
            and w[i - 1] in _IT_VOWELS
            and w[i + 1] in _IT_VOWELS
        ):
            chars[i] = chars[i].upper()
    w = "".join(chars)

    rv = _it_rv(w)
    r1 = _r_after(w, 0, _IT_VOWELS)
    r2 = _r_after(w, r1, _IT_VOWELS)

    # ---- step 0: attached pronoun after gerund/infinitive (all in RV)
    for pron in _IT_PRON:
        if not w.endswith(pron):
            continue
        p = len(w) - len(pron)
        if p < rv:
            continue  # among limited to RV: try a shorter pronoun
        stem = w[:p]
        matched = False
        for a in ("ando", "endo"):
            if stem.endswith(a) and len(stem) - len(a) >= rv:
                w = stem
                matched = True
                break
        if not matched:
            for b in ("ar", "er", "ir"):
                if stem.endswith(b) and len(stem) - len(b) >= rv:
                    w = stem + "e"
                    break
        break

    orig = w
    # ---- step 1: standard suffixes
    for suf, act in _IT_STEP1:
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if act == "del_r2":
            if p >= r2:
                w = w[:p]
        elif act == "azione":
            if p >= r2:
                w = w[:p]
                if w.endswith("ic") and len(w) - 2 >= r2:
                    w = w[:-2]
        elif act == "log":
            if p >= r2:
                w = w[:p] + "log"
        elif act == "u":
            if p >= r2:
                w = w[:p] + "u"
        elif act == "ente":
            if p >= r2:
                w = w[:p] + "ente"
        elif act == "del_rv":
            if p >= rv:
                w = w[:p]
        elif act == "amente":
            if p >= r1:
                w = w[:p]
                if w.endswith("iv") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("at") and len(w) - 2 >= r2:
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if w.endswith(pre) and len(w) - len(pre) >= r2:
                            w = w[: -len(pre)]
                            break
        elif act == "ita":
            if p >= r2:
                w = w[:p]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and len(w) - len(pre) >= r2:
                        w = w[: -len(pre)]
                        break
        elif act == "iv":
            if p >= r2:
                w = w[:p]
                if w.endswith("at") and len(w) - 2 >= r2:
                    w = w[:-2]
                    if w.endswith("ic") and len(w) - 2 >= r2:
                        w = w[:-2]
        break

    step1_changed = w != orig
    if not step1_changed:
        # ---- step 2: verb suffixes (delete if in RV)
        for suf in _IT_STEP2:
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                break

    # ---- step 3a: final vowel (and a preceding i), in RV
    for suf in ("a", "e", "i", "o", "à", "è", "ì", "ò"):
        if w.endswith(suf) and len(w) - 1 >= rv:
            w = w[:-1]
            if w.endswith("i") and len(w) - 1 >= rv:
                w = w[:-1]
            break

    # ---- step 3b: ch/gh -> c/g (suffix wholly in RV)
    for suf, rep in (("ch", "c"), ("gh", "g")):
        if w.endswith(suf) and len(w) - 2 >= rv:
            w = w[: -len(suf)] + rep
            break

    return w.replace("I", "i").replace("U", "u")


class ItalianAnalyzer(_SnowballAnalyzer):
    """Analysis/It/ItalianAnalyzer.cs analogue (stop set + Snowball
    Italian; ElisionFilter's l'/un' splitting is handled by the tokenizer
    apostrophe break)."""

    _stem = staticmethod(italian_stem)

    def __init__(self, stopwords=ITALIAN_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)


# ===========================================================================
# Dutch
# ===========================================================================
DUTCH_STOP_WORDS = frozenset("""
de en van ik te dat die in een hij het niet zijn is was op aan met als
voor had er maar om hem dan zou of wat mijn men dit zo door over ze zich
bij ook tot je mij uit der daar haar naar heb hoe heeft hebben deze u
want nog zal me zij nu ge geen omdat iets worden toch al waren veel meer
doen toen moet ben zonder kan hun dus alles onder ja eens hier wie werd
altijd doch wordt wezen kunnen ons zelf tegen na reeds wil kon niets uw
iemand geweest andere
""".split())

_NL_VOWELS = frozenset("aeiouyè")
_NL_UNACCENT = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _nl_undouble(w: str) -> str:
    for end in ("kk", "dd", "tt"):
        if w.endswith(end):
            return w[:-1]
    return w


def dutch_stem(word: str) -> str:
    """Snowball Dutch stemmer (classic edition), rule-for-rule from the
    published description: strip umlauts/acutes; mark initial y,
    post-vocalic y and intervocalic i as consonants; R1 (>= 3 letters
    before) / R2; step 1 (heden / en / s families with valid-ending
    tests + undoubling), step 2 (final e), step 3a (heid), step 3b
    (d-suffixes end/ing/ig/lijk/baar/bar), step 4 (undouble vowel);
    unmark."""
    w = word.lower().translate(_NL_UNACCENT)
    chars = list(w)
    n = len(chars)
    for i in range(n):
        if chars[i] == "y" and (i == 0 or w[i - 1] in _NL_VOWELS):
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and 0 < i < n - 1
            and w[i - 1] in _NL_VOWELS
            and w[i + 1] in _NL_VOWELS
        ):
            chars[i] = "I"
    w = "".join(chars)

    r1 = _r_after(w, 0, _NL_VOWELS)
    r2 = _r_after(w, r1, _NL_VOWELS)
    r1 = max(r1, 3)

    # ---- step 1
    if w.endswith("heden"):
        if len(w) - 5 >= r1:
            w = w[:-5] + "heid"
    else:
        matched = False
        for suf in ("ene", "en"):
            if w.endswith(suf):
                p = len(w) - len(suf)
                # valid en-ending: non-vowel, and not the string gem
                if p >= r1 and p > 0 and w[p - 1] not in _NL_VOWELS \
                        and not w[:p].endswith("gem"):
                    w = _nl_undouble(w[:p])
                matched = True
                break
        if not matched:
            for suf in ("se", "s"):
                if w.endswith(suf):
                    p = len(w) - len(suf)
                    # valid s-ending: non-vowel other than j
                    if p >= r1 and p > 0 and w[p - 1] not in _NL_VOWELS \
                            and w[p - 1] != "j":
                        w = w[:p]
                    break

    # ---- step 2: final e preceded by non-vowel, in R1
    e_removed = False
    if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # ---- step 3a: heid (not preceded by c), then the en-rule again
    if w.endswith("heid") and len(w) - 4 >= r2 and (len(w) < 5 or w[-5] != "c"):
        w = w[:-4]
        if w.endswith("en"):
            p = len(w) - 2
            if p >= r1 and p > 0 and w[p - 1] not in _NL_VOWELS \
                    and not w[:p].endswith("gem"):
                w = _nl_undouble(w[:p])

    # ---- step 3b: d-suffixes (longest match)
    for suf in ("baar", "lijk", "end", "ing", "bar", "ig"):
        if not w.endswith(suf):
            continue
        p = len(w) - len(suf)
        if suf in ("end", "ing"):
            if p >= r2:
                w = w[:p]
                if w.endswith("ig") and len(w) - 2 >= r2 \
                        and (len(w) < 3 or w[-3] != "e"):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif suf == "ig":
            if p >= r2 and (p == 0 or w[p - 1] != "e"):
                w = w[:p]
        elif suf == "lijk":
            if p >= r2:
                w = w[:p]
                # then repeat step 2
                if w.endswith("e") and len(w) - 1 >= r1 and len(w) >= 2 \
                        and w[-2] not in _NL_VOWELS:
                    w = _nl_undouble(w[:-1])
        elif suf == "baar":
            if p >= r2:
                w = w[:p]
        else:  # bar — only if step 2 actually removed an e
            if p >= r2 and e_removed:
                w = w[:p]
        break

    # ---- step 4: undouble vowel in C V V D (D a non-vowel other than I)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (
            c not in _NL_VOWELS
            and d not in _NL_VOWELS
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            w = w[:-2] + w[-1]

    return w.replace("Y", "y").replace("I", "i")


class DutchAnalyzer(_SnowballAnalyzer):
    """Analysis/Nl/DutchAnalyzer.cs analogue (stop set + Snowball
    Dutch)."""

    _stem = staticmethod(dutch_stem)

    def __init__(self, stopwords=DUTCH_STOP_WORDS, **kw):
        super().__init__(stopwords, **kw)
