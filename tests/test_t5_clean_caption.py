"""clean_caption parity against the reference T5Embedder's normalization
(llamagen/language/t5.py:85-204), imported read-only as an oracle.

The port is transform-for-transform; this test byte-compares the two on an
adversarial corpus (urls, html, unicode junk, dates, IPs, serial ids, CJK,
dimension strings, watermark phrases...). It runs UNCONDITIONALLY: when ftfy
is absent (as in this environment) the reference module is imported with a
stub ftfy whose fix_text is the repo's own fallback — both sides then run
the identical fix_text, so the comparison still exercises every other
transform; with real ftfy installed both sides use it and the comparison is
end-to-end bit-exact."""

import sys
import types

import pytest

from sjd_tpu.models.t5 import clean_caption, fix_text_fallback

torch = pytest.importorskip("torch")
pytest.importorskip("bs4")

try:
    import ftfy  # noqa: F401

    HAVE_FTFY = True
except ImportError:
    HAVE_FTFY = False
    import importlib.machinery

    stub = types.ModuleType("ftfy")
    stub.fix_text = fix_text_fallback
    # a real ModuleSpec so importlib.util.find_spec("ftfy") (used by
    # transformers' lazy-import machinery) doesn't choke on the stub
    stub.__spec__ = importlib.machinery.ModuleSpec("ftfy", loader=None)
    sys.modules["ftfy"] = stub
    # keep the repo implementation on the same fix_text (it already is —
    # models/t5.py falls back to fix_text_fallback when ftfy is absent)

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def ref_clean():
    from llamagen.language.t5 import T5Embedder

    emb = object.__new__(T5Embedder)  # no model load; methods only
    return lambda s: emb.clean_caption(s)


CASES = [
    # plain / casing / whitespace
    "A photo of a cat",
    "A   photo   with   extra spaces  ",
    "UPPER Case MiXeD",
    "  leading and trailing  ",
    "tabs\tand\nnewlines",
    r"literal \n backslash-n",
    # urls
    "visit https://example.com/image.png for more",
    "check www.site.org/page now",
    "source: http://a.b.co/x-y_z?q=1",
    "mysite.com/gallery is great",
    "at foo.edu/dept/page welcome",
    "email me @ bar.net/contact",
    # html
    "an <b>html</b> <person> tag soup",
    "<div class='x'>nested <i>tags</i></div>",
    "html &amp;amp; entities &lt;tag&gt;",
    "&quot;quoted&quot; and &amp; raw",
    "unterminated <b bold",
    # @-handles
    "photo by @someuser on a hill",
    "@a @b2 @c_3 all gone",
    # unicode junk / CJK
    "cat 猫 drawing 漢字 mixed",
    "katakana ㇰ㇡ strokes",
    "enclosed ㊚㊛ letters",
    "yijing ䷀䷁ symbols",
    "compat 豈 ideograph",
    # dashes and quotes
    "dashes - and – en — em",
    "wave〜dash 〰 and ﹣ small",
    "quotes “fancy” and ‘single’",
    "guillemets «here» and ´acute`",
    "doubled ''quotes'' and \"\"more\"\"",
    # ip / dates / ids
    "server at 192.168.0.1 down",
    "posted 12:34  ",
    "photo #123 of the set",
    "lot #123456 auction",
    "serial 1234567 listed",
    "id jc6640 and jc6640vc and 6640vc231",
    "mixed j2d1a2a code",
    "a1b2c3 scrambled",
    # filenames / extensions
    "see IMG_1234.jpg here",
    "download wallpaper.png free",
    "report.pdf attached",
    "png image of a dog",
    "free download poster",
    "worldwide free shipping included",
    "click for details",
    "click on link",
    "page 12 of the catalog",
    # dimensions
    "size 1920x1080 wallpaper",
    "print 8.5х11 inches",  # cyrillic х
    "scale 2×4 panel",
    # punctuation runs
    "ellipsis... and more....",
    "bad punct #### @@@ (parens) [brackets]",
    "stars *** everywhere ***",
    "slashes //\\\\ and pipes |||",
    "a . b . c",
    "this-is-my-cute-cat",
    "this_is_my_cute_cat_again",
    "two-dashes only-here",
    # edge trims
    "trailing period .",
    '"fully quoted caption"',
    "'single quoted'",
    ",starts with comma",
    "ends with dash-",
    ".dotword",
    "1/2 and 3-4 fractions",
    "price, $5./ unit",
    "colon : spaced",
    "%20encoded+plus",
    "<person> washing a car",
]

assert len(CASES) >= 50


@pytest.mark.parametrize("text", CASES)
def test_clean_caption_matches_reference(ref_clean, text):
    want = ref_clean(text)
    got = clean_caption(text)
    assert got == want, (got, want)


@pytest.mark.parametrize("text", CASES[::3])
def test_double_application_matches_reference(ref_clean, text):
    """text_preprocessing applies clean_caption TWICE (t5.py:85-92)."""
    assert clean_caption(clean_caption(text)) == ref_clean(ref_clean(text))


def test_fix_text_fallback_basics():
    """The vendor-light fix_text: ligatures, width folding, curly quotes,
    control chars, NFC — deterministic transforms only."""
    assert fix_text_fallback("ﬁsh ﬂat") == "fish flat"
    assert fix_text_fallback("ｆｕｌｌｗｉｄｔｈ") == "fullwidth"
    assert fix_text_fallback("curly ’quote“") == "curly 'quote\""
    assert fix_text_fallback("ctrl\x07char\r\nline") == "ctrlchar\nline"
    assert fix_text_fallback("&eacute;clair") == "éclair"
    # entities containing '<' are left alone (ftfy's unescape_html='auto')
    assert fix_text_fallback("<b>&amp;</b>") == "<b>&amp;</b>"
