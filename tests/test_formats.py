"""S7-S9 format-specific converters: ChemProt TSV, GENIA XML, ACE SGM/APF →
standoff → token-aligned documents (fixtures are own constructions following
the public format shapes; semantics per the reference converters cited in
sources/formats.py)."""

import pyarrow as pa

from dygiepp_ray.sources.formats import (
    convert_standoff_events_batch,
    parse_ace_apf,
    parse_chemprot,
    parse_genia,
    strip_sgm,
)
from dygiepp_ray.sources.standoff import convert_standoff_batch

# --------------------------------------------------------------- ChemProt

ABSTRACTS = "10000\tAspirin inhibits COX2.\tIt reduces inflammation fast.\n"
#            doc    title (22 chars)        abstract
# text = "Aspirin inhibits COX2. It reduces inflammation fast."
ENTITIES = (
    "10000\tT1\tCHEMICAL\t0\t7\tAspirin\n"
    "10000\tT2\tGENE-Y\t17\t21\tCOX2\n"
    "10000\tT3\tGENE-N\t3\t9\tpirin i\n"  # misaligned on purpose
)
RELATIONS = "10000\tCPR:4\tY \tCPR:4\tArg1:T1\tArg2:T2\n"


def test_parse_chemprot_shapes_and_label_collapse():
    t = parse_chemprot(ABSTRACTS, ENTITIES, RELATIONS)
    assert t.num_rows == 1
    row = t.to_pylist()[0]
    assert row["doc_key"] == "10000"
    assert row["text"].startswith("Aspirin inhibits COX2. It reduces")
    labels = [e["label"] for e in row["entities"]]
    assert labels == ["CHEMICAL", "GENE", "GENE"]  # GENE-Y and GENE-N collapse
    assert row["relations"] == [{"e1": 0, "e2": 1, "label": "CPR:4"}]


def test_chemprot_alignment_drops_misaligned():
    doc = convert_standoff_batch(
        parse_chemprot(ABSTRACTS, ENTITIES, RELATIONS)
    ).to_pylist()[0]
    # T1/T2 align in sentence 0; T3 starts mid-token and is dropped
    assert doc["n_entities_dropped"] == 1
    flat_ner = [m for sent in doc["ner"] for m in sent]
    assert {m["label"] for m in flat_ner} == {"CHEMICAL", "GENE"}
    rels = [r for sent in doc["relations"] for r in sent]
    assert len(rels) == 1 and rels[0]["label"] == "CPR:4"


# ------------------------------------------------------------------ GENIA

GENIA_XML = """<set>
<article>
<articleinfo><bibliomisc>MEDLINE:95000001</bibliomisc></articleinfo>
<title><sentence>Role of <cons sem="G#protein_molecule">IL-2</cons> signaling.</sentence></title>
<abstract>
<sentence>The <cons sem="G#cell_type">T cells</cons> express <cons sem="G#protein_family_or_group"><cons sem="G#protein_molecule">IL-2</cons> receptors</cons>.</sentence>
<sentence>Coordinated <cons lex="(AND a b)" sem="(AND G#DNA_domain_or_region G#DNA_domain_or_region)"><cons lex="a*">alpha</cons> and <cons lex="b*">beta</cons> motifs</cons> here.</sentence>
</abstract>
</article>
</set>"""


def test_parse_genia_nested_and_coordination():
    t = parse_genia(GENIA_XML)
    row = t.to_pylist()[0]
    assert row["doc_key"] == "MEDLINE:95000001"
    # nested cons produce BOTH the inner and outer protein spans; the
    # coordinated (AND ...) term is dropped; five-type filter maps sems
    surfaces = [row["text"][e["start_char"]:e["end_char"]] for e in row["entities"]]
    assert "IL-2" in surfaces and "T cells" in surfaces
    assert "IL-2 receptors" in surfaces  # outer protein_family span kept
    assert all("alpha" not in s for s in surfaces)
    labels = {e["label"] for e in row["entities"]}
    assert labels == {"protein", "cell_type"}


def test_genia_five_type_off_keeps_raw_sems():
    t = parse_genia(GENIA_XML, use_five_types=False)
    labels = {e["label"] for e in t.to_pylist()[0]["entities"]}
    assert "G#protein_molecule" in labels


def test_genia_alignment_end_to_end():
    doc = convert_standoff_batch(parse_genia(GENIA_XML)).to_pylist()[0]
    flat = [m for sent in doc["ner"] for m in sent]
    assert len(flat) >= 3
    assert doc["n_relations_dropped"] == 0


# -------------------------------------------------------------------- ACE

SGM = "<DOC><BODY><TEXT>Bob Smith traveled to Paris. He met Alice there.</TEXT></BODY></DOC>"
# stripped text: "Bob Smith traveled to Paris. He met Alice there."
APF = """<source_file>
<document DOCID="ACE_TEST_01">
<entity ID="E1" TYPE="PER">
  <entity_mention ID="E1-1" TYPE="NAM">
    <extent><charseq START="0" END="8">Bob Smith</charseq></extent>
    <head><charseq START="4" END="8">Smith</charseq></head>
  </entity_mention>
</entity>
<entity ID="E2" TYPE="GPE">
  <entity_mention ID="E2-1" TYPE="NAM">
    <extent><charseq START="22" END="26">Paris</charseq></extent>
    <head><charseq START="22" END="26">Paris</charseq></head>
  </entity_mention>
</entity>
<relation ID="R1" TYPE="PHYS">
  <relation_mention ID="R1-1">
    <relation_mention_argument REFID="E1-1" ROLE="Arg-1"><extent><charseq START="0" END="8">Bob Smith</charseq></extent></relation_mention_argument>
    <relation_mention_argument REFID="E2-1" ROLE="Arg-2"><extent><charseq START="22" END="26">Paris</charseq></extent></relation_mention_argument>
  </relation_mention>
</relation>
<event ID="V1" TYPE="Movement" SUBTYPE="Transport">
  <event_mention ID="V1-1">
    <anchor><charseq START="10" END="17">traveled</charseq></anchor>
    <event_mention_argument REFID="E1-1" ROLE="Artifact"><extent><charseq START="0" END="8">Bob Smith</charseq></extent></event_mention_argument>
    <event_mention_argument REFID="E2-1" ROLE="Destination"><extent><charseq START="22" END="26">Paris</charseq></extent></event_mention_argument>
  </event_mention>
</event>
</document>
</source_file>"""


def test_strip_sgm_offsets():
    text = strip_sgm(SGM)
    assert text == "Bob Smith traveled to Paris. He met Alice there."
    assert text[4:9] == "Smith" and text[22:27] == "Paris"


def test_parse_ace_apf_heads_and_events():
    row = parse_ace_apf(SGM, APF).to_pylist()[0]
    assert row["doc_key"] == "ACE_TEST_01"
    assert [e["label"] for e in row["entities"]] == ["PER", "GPE"]
    assert row["entities"][0]["start_char"] == 4  # head, not extent
    assert row["relations"] == [{"e1": 0, "e2": 1, "label": "PHYS"}]
    ev = row["events"][0]
    assert ev["event_type"] == "Movement.Transport"
    assert ev["trigger_start"] == 10 and ev["trigger_end"] == 18
    assert [a["role"] for a in ev["args"]] == ["Artifact", "Destination"]


def test_ace_event_alignment():
    doc = convert_standoff_events_batch(parse_ace_apf(SGM, APF)).to_pylist()[0]
    # sentence 0: "Bob Smith traveled to Paris ." with tokens
    evs = [e for sent in doc["events"] for e in sent]
    assert len(evs) == 1
    ev = evs[0]
    assert doc["sentences"][0][ev["trigger_tok"]] == "traveled"
    assert {a["role"] for a in ev["args"]} == {"Artifact", "Destination"}
    assert doc["n_events_dropped"] == 0
    # extent mode keeps full mention spans
    row = parse_ace_apf(SGM, APF, heads_only=False).to_pylist()[0]
    assert row["entities"][0]["start_char"] == 0
