"""Grammar-constrained decoding tests (GBNF engine, JSON-schema compiler,
vocab masking, engine + scheduler integration).

This capability exceeds the reference (BitNet-rs has no grammar support);
semantics follow the llama.cpp GBNF dialect.
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from bitnet_tpu.config import EngineConfig, GenerationConfig
from bitnet_tpu.engine import InferenceEngine
from bitnet_tpu.engine.stop import StopReason
from bitnet_tpu.errors import InferenceError
from bitnet_tpu.grammar import (
    JSON_GRAMMAR,
    Grammar,
    GrammarError,
    GrammarMatcher,
    TokenVocab,
    VocabMatcher,
    json_schema_grammar,
)

ECFG = EngineConfig(max_seq_len=128, compute_dtype="f32")


def accepts(g: Grammar, text: str, complete: bool = True) -> bool:
    m = GrammarMatcher(g)
    if not m.feed_text(text):
        return False
    return m.can_complete if complete else True


# ---------------------------------------------------------------- GBNF core
class TestGBNF:
    def test_literal_alternation(self):
        g = Grammar.from_gbnf('root ::= "yes" | "no"')
        assert accepts(g, "yes") and accepts(g, "no")
        assert not accepts(g, "maybe")
        assert not accepts(g, "ye")          # prefix incomplete
        assert accepts(g, "ye", complete=False)

    def test_char_classes_and_negation(self):
        g = Grammar.from_gbnf('root ::= [a-cx] [^0-9]')
        assert accepts(g, "aZ") and accepts(g, "x!")
        assert not accepts(g, "dZ") and not accepts(g, "a5")

    def test_repetitions(self):
        g = Grammar.from_gbnf('root ::= "a"* "b"+ "c"?')
        for ok in ("b", "ab", "aaabbc", "bbb", "bc"):
            assert accepts(g, ok), ok
        for bad in ("", "a", "ac", "cb"):
            assert not accepts(g, bad), bad

    def test_bounded_repetition(self):
        g = Grammar.from_gbnf('root ::= [0-9]{2,4}')
        assert not accepts(g, "1")
        assert accepts(g, "12") and accepts(g, "1234")
        m = GrammarMatcher(g)
        assert m.feed_text("1234")
        assert not m.feed_text("5")          # 5th digit rejected

    def test_open_repetition(self):
        g = Grammar.from_gbnf('root ::= "x"{3,}')
        assert not accepts(g, "xx")
        assert accepts(g, "xxx") and accepts(g, "x" * 10)

    def test_recursion(self):
        g = Grammar.from_gbnf('root ::= "(" root ")" | ""')
        assert accepts(g, "") and accepts(g, "((()))")
        assert not accepts(g, "(()")

    def test_groups_dot_escapes(self):
        g = Grammar.from_gbnf(r'root ::= ("ab" | "cd")+ "\n" .')
        assert accepts(g, "abcd\nZ")
        assert not accepts(g, "ab\nZ\n")

    def test_continuation_lines_and_comments(self):
        g = Grammar.from_gbnf(
            '# top\nroot ::= a\n       | b  # tail\na ::= "aa"\nb ::= "bb"\n')
        assert accepts(g, "aa") and accepts(g, "bb")
        assert not accepts(g, "ab")

    def test_hex_unicode_escapes(self):
        g = Grammar.from_gbnf(r'root ::= "\x41" [B-D]')
        assert accepts(g, "AB") and accepts(g, "AD")
        assert not accepts(g, "AE")

    def test_errors(self):
        for bad in ('root ::= undefined_rule',
                    'noroot ::= "x"',
                    'root ::= "unterminated',
                    'root ::= [0-9]{4,2}',
                    'root ::',
                    'root ::= "a" | | "b"'):
            with pytest.raises(GrammarError):
                Grammar.from_gbnf(bad)

    def test_would_accept_is_stateless(self):
        g = Grammar.from_gbnf('root ::= "ab"')
        m = GrammarMatcher(g)
        assert m.would_accept("ab")
        assert m.would_accept("ab")          # unchanged state
        assert m.feed_text("a") and m.would_accept("b")


# ------------------------------------------------------------- JSON grammar
class TestJSONGrammar:
    @pytest.fixture(scope="class")
    def gj(self):
        return Grammar.from_gbnf(JSON_GRAMMAR)

    @pytest.mark.parametrize("doc", [
        '{}', '[]', '"s"', '0', '-1.5e3', 'true', 'false', 'null',
        '{"a": [1, 2.5], "b": {"c": null}, "d": "q\\"uote"}',
        '[{"x": [[]]}, -0.125]',
    ])
    def test_accepts_valid_json(self, gj, doc):
        assert accepts(gj, doc), doc
        json.loads(doc)                      # sanity: python agrees

    @pytest.mark.parametrize("doc", [
        '{', '{"a":}', '{,}', '[1,]', '01', '+1', "'s'", 'tru',
        '{"a" 1}', 'nul',
    ])
    def test_rejects_invalid_json(self, gj, doc):
        assert not accepts(gj, doc), doc


class TestJSONSchema:
    def test_object_schema(self):
        src = json_schema_grammar({
            "type": "object",
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer"},
                "mood": {"enum": ["happy", "sad"]},
            },
            "required": ["name", "age"],
        })
        g = Grammar.from_gbnf(src)
        assert accepts(g, '{"name": "bo", "age": 3, "mood": "sad"}')
        assert accepts(g, '{"name": "bo", "age": -42}')
        assert not accepts(g, '{"age": 3}')                 # missing name
        assert not accepts(g, '{"name": "bo", "age": 1.5}')  # not integer
        assert not accepts(g, '{"name": "bo", "age": 3, "mood": "angry"}')

    def test_array_bounds(self):
        src = json_schema_grammar({"type": "array",
                                   "items": {"type": "boolean"},
                                   "minItems": 1, "maxItems": 2})
        g = Grammar.from_gbnf(src)
        assert accepts(g, '[true]') and accepts(g, '[true, false]')
        assert not accepts(g, '[]')
        assert not accepts(g, '[true, false, true]')
        assert not accepts(g, '[1]')

    def test_refs_and_nesting(self):
        src = json_schema_grammar({
            "$defs": {"leaf": {"type": "object",
                               "properties": {"v": {"type": "number"}},
                               "required": ["v"],
                               "additionalProperties": False}},
            "type": "object",
            "properties": {"l": {"$ref": "#/$defs/leaf"},
                           "alt": {"anyOf": [{"type": "null"},
                                             {"type": "string"}]}},
            "required": ["l", "alt"],
        })
        g = Grammar.from_gbnf(src)
        assert accepts(g, '{"l": {"v": 1.5}, "alt": null}')
        assert accepts(g, '{"l": {"v": 2}, "alt": "x"}')
        assert not accepts(g, '{"l": {}, "alt": null}')

    def test_const_and_type_union(self):
        src = json_schema_grammar({
            "type": "object",
            "properties": {"k": {"const": "fixed"},
                           "n": {"type": ["integer", "null"]}},
            "required": ["k", "n"]})
        g = Grammar.from_gbnf(src)
        assert accepts(g, '{"k": "fixed", "n": 7}')
        assert accepts(g, '{"k": "fixed", "n": null}')
        assert not accepts(g, '{"k": "other", "n": 7}')

    def test_unsupported_rejected(self):
        with pytest.raises(GrammarError):
            json_schema_grammar({"type": "string", "pattern": "^a+$"})
        with pytest.raises(GrammarError):
            json_schema_grammar({"$ref": "http://remote/schema"})
        with pytest.raises(GrammarError):
            json_schema_grammar("{not json")


# ------------------------------------------------------------- vocab masks
class TestVocabMask:
    def test_mask_and_eos(self):
        pieces = ["<pad>", "<eos>", "y", "e", "s", "n", "o", "ye", "yes",
                  "no", "x"]
        vocab = TokenVocab(pieces, eos_token_id=1)
        g = Grammar.from_gbnf('root ::= "yes" | "no"')
        m = VocabMatcher(g, vocab)
        mask = m.allowed_mask()
        assert {pieces[i] for i in np.where(mask)[0]} == \
            {"y", "n", "ye", "yes", "no"}
        m.accept(pieces.index("ye"))
        mask = m.allowed_mask()
        assert {pieces[i] for i in np.where(mask)[0]} == {"s"}
        m.accept(pieces.index("s"))
        mask = m.allowed_mask()
        # complete: only EOS remains
        assert m.exhausted
        assert list(np.where(mask)[0]) == [1]

    def test_mask_cache_shared_state(self):
        vocab = TokenVocab(["a", "b", "<eos>"], eos_token_id=2)
        g = Grammar.from_gbnf('root ::= ("a" | "b")*')
        m = VocabMatcher(g, vocab)
        m1 = m.allowed_mask()
        m.accept(0)
        m2 = m.allowed_mask()
        assert (m1 == m2).all()              # same pushdown state


# -------------------------------------------------------- engine integration
@pytest.fixture(scope="module")
def engine(mini_gguf_f32):
    return InferenceEngine.from_gguf(mini_gguf_f32.path, ECFG)


PROMPT = [1, 7, 20, 3]


class TestEngineGrammar:
    def test_yes_no(self, engine):
        gen = GenerationConfig(max_new_tokens=16, greedy=True,
                               grammar='root ::= "yes" | "no"')
        r = engine.generate(PROMPT, gen)
        assert r.text in ("yes", "no")
        assert r.stop_reason == StopReason.EOS

    def test_sampled_stays_in_grammar(self, engine):
        gen = GenerationConfig(max_new_tokens=24, temperature=1.5,
                               top_k=0, seed=11,
                               grammar='root ::= [ab]{8} "!"')
        r = engine.generate(PROMPT, gen)
        assert len(r.text) == 9 and r.text.endswith("!")
        assert set(r.text[:8]) <= {"a", "b"}
        assert r.stop_reason == StopReason.EOS

    def test_json_object_output(self, engine):
        src = json_schema_grammar({
            "type": "object",
            "properties": {"ok": {"type": "boolean"}},
            "required": ["ok"]})
        gen = GenerationConfig(max_new_tokens=40, greedy=True, grammar=src)
        r = engine.generate(PROMPT, gen)
        doc = json.loads(r.text)
        assert isinstance(doc["ok"], bool)

    def test_determinism(self, engine):
        gen = GenerationConfig(max_new_tokens=20, temperature=0.9, seed=5,
                               grammar=JSON_GRAMMAR)
        a = engine.generate(PROMPT, gen).token_ids
        b = engine.generate(PROMPT, gen).token_ids
        assert a == b

    def test_unconstrained_differs(self, engine):
        """The grammar actually changes the output (mask is live)."""
        gen_g = GenerationConfig(max_new_tokens=8, greedy=True,
                                 grammar='root ::= "zzz" [0-9]*')
        gen_u = GenerationConfig(max_new_tokens=8, greedy=True)
        rg = engine.generate(PROMPT, gen_g)
        ru = engine.generate(PROMPT, gen_u)
        assert rg.text.startswith("zzz")
        assert rg.token_ids != ru.token_ids

    def test_batch_api_rejects_grammar(self, engine):
        with pytest.raises(InferenceError):
            engine.generate_batch([PROMPT],
                                  GenerationConfig(grammar=JSON_GRAMMAR))

    def test_bad_grammar_raises(self, engine):
        with pytest.raises(GrammarError):
            engine.generate(PROMPT, GenerationConfig(grammar="root ::"))


# ----------------------------------------------------- scheduler integration
class TestSchedulerGrammar:
    @pytest.fixture(scope="class")
    def sched(self, mini_gguf_f32):
        from bitnet_tpu.models import load_model
        from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        s = ContinuousBatchingScheduler(cfg, params, tok, ECFG, num_slots=2,
                                        decode_steps_per_dispatch=4)
        yield s
        s.shutdown()

    def collect(self, req, timeout=120):
        toks, texts, reason = [], [], None
        while True:
            tok, text, done, r = req.out.get(timeout=timeout)
            if tok is not None:
                toks.append(tok)
                texts.append(text)
            if done:
                return toks, "".join(texts), r

    @pytest.mark.parametrize("gen", [
        GenerationConfig(max_new_tokens=16, greedy=True,
                         grammar='root ::= "yes" | "no"'),
        GenerationConfig(max_new_tokens=20, temperature=0.9, seed=7,
                         grammar='root ::= [a-d]{4,8}'),
    ], ids=["greedy", "sampled"])
    def test_engine_parity(self, sched, engine, gen):
        """Scheduler grammar slots sample token-for-token like the engine."""
        want = engine.generate(PROMPT, gen).token_ids
        req = sched.submit(PROMPT, gen)
        got, _, _ = self.collect(req)
        assert got == want

    def test_mixed_slots(self, sched):
        """A grammar slot and a plain slot run concurrently (K forced 1)."""
        g = sched.submit(PROMPT, GenerationConfig(
            max_new_tokens=6, greedy=True, grammar='root ::= [ab]*'))
        p = sched.submit([2, 9, 4], GenerationConfig(
            max_new_tokens=6, greedy=True))
        gt, gtext, _ = self.collect(g)
        pt, _, _ = self.collect(p)
        assert set(gtext) <= {"a", "b"}
        assert len(pt) == 6

    def test_checkpoint_resume_grammar(self, mini_gguf_f32, tmp_path):
        from bitnet_tpu.models import load_model
        from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        gen = GenerationConfig(max_new_tokens=10, greedy=True,
                               grammar='root ::= [ab]{6} "!"')
        s1 = ContinuousBatchingScheduler(cfg, params, tok, ECFG,
                                         num_slots=1, start_loop=False)
        s1.submit(PROMPT, gen)
        for _ in range(4):
            s1._step()                        # a few tokens in
        assert s1.slots[0].active
        partial = list(s1.slots[0].out_ids)
        assert 0 < len(partial) < 7
        s1.checkpoint_requests(str(tmp_path))
        s1.shutdown()

        s2 = ContinuousBatchingScheduler(cfg, params, tok, ECFG,
                                         num_slots=1)
        (req,) = s2.resume_requests(str(tmp_path))
        toks, text, _ = self.collect(req)
        s2.shutdown()
        full = "".join(tok.token_to_piece(t) for t in partial) + text
        assert len(full) == 7 and full.endswith("!")
        assert set(full[:6]) <= {"a", "b"}


# ------------------------------------------------- server body validation
class TestServerGrammarValidation:
    """Unit tests of the HTTP request-body grammar plumbing (the route
    handlers are exercised by tests/test_serve.py; these cover the pure
    helpers so the fast tier catches regressions)."""

    def test_resolve_precedence(self):
        from bitnet_tpu.serve.server import _resolve_grammar

        gb = 'root ::= "x"'
        assert _resolve_grammar({"grammar": gb}) == gb
        assert _resolve_grammar(
            {"grammar": gb, "response_format": {"type": "json_object"}}) == gb
        assert _resolve_grammar(
            {"response_format": {"type": "json_object"}}) == JSON_GRAMMAR
        assert _resolve_grammar({}) is None
        assert _resolve_grammar(
            {"response_format": {"type": "text"}}) is None

    def test_resolve_json_schema_forms(self):
        from bitnet_tpu.serve.server import _resolve_grammar

        schema = {"type": "object", "properties": {"a": {"type": "integer"}},
                  "required": ["a"]}
        direct = _resolve_grammar({"json_schema": schema})
        via_rf = _resolve_grammar({"response_format": {
            "type": "json_schema", "json_schema": {"schema": schema}}})
        assert direct == via_rf
        g = Grammar.from_gbnf(direct)
        assert accepts(g, '{"a": 42}')
        assert not accepts(g, '{"a": "nope"}')

    def test_validate_body_rejects_bad(self):
        from bitnet_tpu.serve.server import _validate_body

        base = {"prompt": "x"}
        assert _validate_body(dict(base, grammar=7)) is not None
        assert _validate_body(dict(base, grammar="root ::")) is not None
        assert _validate_body(
            dict(base, response_format={"type": "yaml"})) is not None
        assert _validate_body(dict(base, response_format={
            "type": "json_schema", "json_schema": {"schema": 3}})) is not None
        assert _validate_body(
            dict(base, grammar='root ::= "ok"')) is None
        assert _validate_body(
            dict(base, response_format={"type": "json_object"})) is None


# ------------------------------------------------------------ compat layer
class TestCompatGrammar:
    def test_llama_grammar_objects(self):
        from bitnet_tpu.compat import LlamaGrammar

        g = LlamaGrammar.from_string('root ::= "a" | "b"')
        assert str(g) == 'root ::= "a" | "b"'
        with pytest.raises(GrammarError):
            LlamaGrammar.from_string("root ::")
        js = LlamaGrammar.from_json_schema(
            {"type": "object", "properties": {}})
        assert accepts(Grammar.from_gbnf(str(js)), "{}")

    def test_grammar_source_resolution(self):
        from bitnet_tpu.compat.llama import LlamaGrammar, _grammar_source

        gb = 'root ::= "z"'
        assert _grammar_source(LlamaGrammar(gb)) == gb
        assert _grammar_source(gb) == gb
        assert _grammar_source(None, {"type": "json_object"}) == JSON_GRAMMAR
        sch = {"type": "array", "items": {"type": "integer"}}
        a = _grammar_source(None, {"type": "json_object", "schema": sch})
        b = _grammar_source(None, {"type": "json_schema",
                                   "json_schema": {"schema": sch}})
        assert a == b == json_schema_grammar(sch)
        assert _grammar_source(None, None) is None

    def test_create_completion_constrained(self, mini_gguf_f32):
        from bitnet_tpu.compat import Llama, LlamaGrammar

        llm = Llama(mini_gguf_f32.path, n_ctx=128, seed=3, verbose=False)
        out = llm.create_completion(
            "q", max_tokens=16, temperature=0.0,
            grammar=LlamaGrammar.from_string('root ::= "yes" | "no"'))
        assert out["choices"][0]["text"] in ("yes", "no")
        chat = llm.create_chat_completion(
            [{"role": "user", "content": "q"}], max_tokens=30,
            temperature=0.0, response_format={"type": "json_object"})
        json.loads(chat["choices"][0]["message"]["content"])


# ------------------------------------------------------- engine resume
class TestGrammarResume:
    def test_generate_from_state_replays(self, engine):
        """Checkpoint-style continuation rebuilds the pushdown state from
        the already-generated suffix (engine.generate_from_state)."""
        gen = GenerationConfig(max_new_tokens=12, greedy=True,
                               grammar='root ::= [ab]{6} "!"')
        full = engine.generate(PROMPT, gen)
        assert full.text.endswith("!") and len(full.text) == 7

        # split the run: emit k tokens, then continue from state
        k = 3
        head = full.token_ids[:k]
        cont = engine.generate_from_state(
            PROMPT + head, already_generated=k, gen_cfg=gen)
        assert head + cont.token_ids == full.token_ids


# ------------------------------------------------- DFA mask equivalence
class TestDFAMaskEquivalence:
    """The vectorized class-DFA mask must equal the brute-force
    per-token pushdown check at every step of a generation."""

    @pytest.mark.parametrize("gbnf,text", [
        (JSON_GRAMMAR, '{"a": [1.5, true, "x y"], "b": null}'),
        ('root ::= ("ab" | [0-9]{2} | "c" root)*', 'ab42cab'),
        ('root ::= [^"]* ["]', 'plain text!'),
    ])
    def test_matches_bruteforce(self, gbnf, text):
        pieces = ([""]                     # 0 = eos
                  + [chr(c) for c in range(32, 127)]
                  + ["ab", "42", "tru", "true", "null", '"x', "x y",
                     "  ", '{"', '"]', "1.5", "cab", "zz9"])
        vocab = TokenVocab(pieces, eos_token_id=0)
        g = Grammar.from_gbnf(gbnf)
        m = VocabMatcher(g, vocab)
        for step_ch in text + "\0":        # include the final state
            mask = m.allowed_mask()
            for tid, piece in enumerate(pieces):
                if tid == 0 or not piece:
                    want = m.matcher.can_complete
                else:
                    want = m.matcher.would_accept(piece)
                assert mask[tid] == want, (step_ch, tid, piece)
            if step_ch == "\0":
                break
            assert m.matcher.feed_text(step_ch), (text, step_ch)


# ---------------------------------------------------------------- fuzzing
class TestGrammarFuzz:
    """No-panic / consistency properties (the pytest translation of the
    reference's grammar-adjacent fuzz targets, SURVEY §4 item 3)."""

    def test_parser_never_hangs_or_crashes(self):
        """Random GBNF-ish soup either compiles or raises GrammarError —
        never an unbounded loop or a foreign exception."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        alphabet = 'ab01 ":=|()[]{}*+?-^\\\n#.'

        @settings(max_examples=300, deadline=2000)
        @given(st.text(alphabet=alphabet, max_size=80))
        def check(text):
            try:
                Grammar.from_gbnf('root ::= "x"\n' + text)
            except GrammarError:
                pass

        check()

    def test_matcher_consistency_random_walk(self):
        """would_accept == (copy + feed_text) for random inputs; the
        stack-set matcher state never mutates on rejection."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        g = Grammar.from_gbnf(
            'root ::= item ("," item)*\nitem ::= [a-c]{1,3} | "(" root ")"')

        @settings(max_examples=200, deadline=2000)
        @given(st.text(alphabet="abc,()x", max_size=24))
        def check(text):
            m = GrammarMatcher(g)
            for ch in text:
                before = m.stacks
                ok_preview = m.would_accept(ch)
                assert m.stacks == before          # stateless preview
                ok = m.feed_text(ch)
                assert ok == ok_preview
                if not ok:
                    assert m.stacks == before      # reject keeps state
                    return

        check()

    def test_schema_compiler_no_panic(self):
        """Random nested schemas: compile + the grammar accepts a JSON
        document that instantiates the schema."""
        import json as _json

        from hypothesis import given, settings
        from hypothesis import strategies as st

        leaf = st.sampled_from([
            {"type": "integer"}, {"type": "number"}, {"type": "boolean"},
            {"type": "null"}, {"type": "string"},
            {"enum": ["x", 1, None]}, {"const": "k"},
        ])
        schemas = st.recursive(
            leaf,
            lambda kids: st.one_of(
                st.fixed_dictionaries(
                    {"type": st.just("array"), "items": kids}),
                st.builds(
                    lambda props, req: {
                        "type": "object", "properties": props,
                        "required": sorted(req & set(props))},
                    st.dictionaries(
                        st.sampled_from(["a", "b", "c"]), kids,
                        min_size=1, max_size=3),
                    st.sets(st.sampled_from(["a", "b", "c"]))),
                st.builds(lambda a, b: {"anyOf": [a, b]}, kids, kids),
            ),
            max_leaves=8)

        def instance(s):
            if "const" in s:
                return s["const"]
            if "enum" in s:
                return s["enum"][0]
            t = s.get("type")
            if t == "array":
                return [instance(s["items"])]
            if t == "object":
                return {k: instance(v) for k, v in s["properties"].items()}
            if "anyOf" in s:
                return instance(s["anyOf"][0])
            return {"integer": 3, "number": -1.5, "boolean": True,
                    "null": None, "string": "s"}[t]

        @settings(max_examples=120, deadline=5000)
        @given(schemas)
        def check(schema):
            g = Grammar.from_gbnf(json_schema_grammar(schema))
            doc = _json.dumps(instance(schema))
            assert accepts(g, doc), (schema, doc)

        check()


# ------------------------------------------------------ paged-pool parity
@pytest.mark.slow
class TestPagedGrammar:
    def test_paged_matches_dense_and_engine(self, mini_gguf_f32, engine):
        from bitnet_tpu.models import load_model
        from bitnet_tpu.serve.scheduler import ContinuousBatchingScheduler
        from bitnet_tpu.tokenizer import load_tokenizer

        cfg, params, _ = load_model(mini_gguf_f32.path,
                                    param_dtype=jnp.float32)
        tok = load_tokenizer(mini_gguf_f32.path)
        gen = GenerationConfig(max_new_tokens=12, temperature=0.8, seed=13,
                               grammar='root ::= [ab]{2,10} "!"',
                               logprobs=1)
        want = engine.generate(PROMPT, gen)
        s = ContinuousBatchingScheduler(
            cfg, params, tok, ECFG, num_slots=2,
            paged=True, num_pages=32, page_size=16)
        try:
            req = s.submit(PROMPT, gen)
            toks = []
            while True:
                t, _x, done, _r = req.out.get(timeout=120)
                if t is not None:
                    toks.append(t)
                if done:
                    break
            assert toks == want.token_ids
            assert len(req.logprobs) == len(toks)
            for se, ee in zip(req.logprobs, want.logprobs):
                assert se["token_id"] == ee["token_id"]
                assert se["logprob"] == pytest.approx(ee["logprob"],
                                                      abs=1e-4)
        finally:
            s.shutdown()
