"""Prompt builders — reference ``xpacks/llm/prompts.py``.

Reference: per-row ``@pw.udf`` string formatters (prompt_short_qa:7,
prompt_qa:56, prompt_qa_geometric_rag:116, prompt_summarize:187,
prompt_query_rewrite_hyde:207, prompt_query_rewrite:226,
prompt_citing_qa:259, parse_cited_response:304).

Spark-first restatement: every prompt is a pure COLUMN EXPRESSION
(transform + array_join + concat) — prompt assembly for a billion rows
never leaves the JVM.  Template knobs (not-found response, extra rules,
strict JSON mode) are Python-side constants folded into the expression.

The templates keep the reference's documented structure (numbered
"Source i:" context blocks, citation instruction, query/answer scaffold)
— they are inputs to an LLM, so structure is the contract, not the exact
prose.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = [
    "prompt_short_qa",
    "prompt_qa",
    "prompt_qa_geometric_rag",
    "prompt_summarize",
    "prompt_query_rewrite_hyde",
    "prompt_query_rewrite",
    "prompt_citing_qa",
    "parse_cited_response",
]


def _numbered_context(docs: Column) -> Column:
    """array<string> docs → 'Source 1: …\\nSource 2: …' (reference
    prompt_qa_geometric_rag's enumerate loop, prompts.py:125)."""
    numbered = F.zip_with(
        docs,
        F.sequence(F.lit(1), F.greatest(F.size(docs), F.lit(1))),
        lambda d, i: F.concat(F.lit("Source "), i.cast("string"), F.lit(": "), d),
    )
    return F.array_join(numbered, "\n")


def prompt_qa_geometric_rag(
    query: Column,
    docs: Column,
    information_not_found_response: str = "No information found.",
    additional_rules: str = "",
    strict_prompt: bool = False,
) -> Column:
    """Reference prompts.py:116 — context-grounded QA prompt with numbered
    sources and citation instructions; ``strict_prompt`` switches to the
    parsable-JSON variant for small local models."""
    if strict_prompt:
        head = (
            "Use the below articles to answer the subsequent question. If the "
            f'answer cannot be found in the articles, write "'
            f'{information_not_found_response}" Do not explain. '
            "ONLY RESPOND IN PARSABLE JSON WITH THE ONLY KEY `answer`. "
            "When referencing information from a source, cite it with its "
            "number in brackets, e.g. [2]."
        )
        tail = (
            "\nONLY RESPOND IN PARSABLE JSON WITH THE ONLY KEY `answer` "
            "containing your response. Response:"
        )
    else:
        head = (
            "Use the below articles to answer the subsequent question. If the "
            f'answer cannot be found in the articles, write "'
            f'{information_not_found_response}" Do not answer in full '
            "sentences. When referencing information from a source, cite it "
            "with its number in brackets, e.g. [2]. Every answer should "
            "include at least one source citation."
        )
        tail = "\nAnswer:"
    return F.concat(
        F.lit(head + additional_rules + "\n------\n"),
        _numbered_context(docs),
        F.lit("\n------\nQuery: "),
        query,
        F.lit(tail),
    )


def prompt_short_qa(
    query: Column, docs: Column, additional_rules: str = ""
) -> Column:
    """Reference prompts.py:7 — concise single-phrase answer prompt."""
    return F.concat(
        F.lit(
            "Please provide an answer based solely on the provided sources. "
            "Keep your answer concise and accurate. Make sure that it starts "
            "with an expression in standardized format."
            + additional_rules
            + "\n------\n"
        ),
        _numbered_context(docs),
        F.lit("\n------\nQuery: "),
        query,
        F.lit("\nAnswer:"),
    )


def prompt_qa(
    query: Column,
    docs: Column,
    information_not_found_response: str = "No information found.",
    additional_rules: str = "",
) -> Column:
    """Reference prompts.py:56 — standard grounded-QA prompt."""
    return prompt_qa_geometric_rag(
        query,
        docs,
        information_not_found_response=information_not_found_response,
        additional_rules=additional_rules,
        strict_prompt=False,
    )


def prompt_summarize(text_list: Column) -> Column:
    """Reference prompts.py:187 — multi-document summarization prompt.

    >>> d = spark.createDataFrame([(["a doc", "b doc"],)], "t array<string>")
    >>> d.select(prompt_summarize(F.col("t")).alias("p")).first()["p"][:31]
    'Given a list of documents, summ'
    """
    return F.concat(
        F.lit(
            "Given a list of documents, summarize them in few sentences "
            "while preserving important points and entities.\nDocuments: "
        ),
        F.array_join(text_list, "\n"),
        F.lit("\nSummary:"),
    )


def prompt_query_rewrite_hyde(query: Column) -> Column:
    """Reference prompts.py:207 — HyDE: ask for a hypothetical answer
    passage to embed instead of the raw query."""
    return F.concat(
        F.lit(
            "Write a passage that could plausibly answer the following "
            "question. Write as if it came from a relevant document, without "
            "disclaimers.\nQuestion: "
        ),
        query,
        F.lit("\nPassage:"),
    )


def prompt_query_rewrite(query: Column, *additional_args: Column) -> Column:
    """Reference prompts.py:226 — rewrite a user query for retrieval,
    optionally folding extra context columns in."""
    parts: list[Column] = [
        F.lit(
            "Rewrite the following query so it is clear, specific and "
            "self-contained for document retrieval. Return only the "
            "rewritten query.\nQuery: "
        ),
        query,
    ]
    for extra in additional_args:
        parts += [F.lit("\nContext: "), extra]
    parts.append(F.lit("\nRewritten query:"))
    return F.concat(*parts)


def prompt_citing_qa(
    query: Column, docs: Column, additional_rules: str = ""
) -> Column:
    """Reference prompts.py:259 — QA prompt that demands bracketed source
    citations so :func:`parse_cited_response` can recover them."""
    return prompt_qa_geometric_rag(
        query,
        docs,
        additional_rules=(
            " Cite every source you use with its bracketed number."
            + additional_rules
        ),
        strict_prompt=False,
    )


def parse_cited_response(response_text: Column, docs: Column) -> Column:
    """Reference prompts.py:304 — split a cited answer into the text and
    the cited documents.  Returns struct<answer, cited_docs: array<string>>;
    citation markers are ``[n]`` (1-based source numbers).  Pure column
    expression: regexp_extract_all + element_at."""
    cited_idx = F.array_distinct(
        F.transform(
            F.regexp_extract_all(response_text, F.lit(r"\[(\d+)\]"), 1),
            lambda s: s.cast("int"),
        )
    )
    cited_docs = F.filter(
        F.transform(cited_idx, lambda i: F.try_element_at(docs, i)),
        lambda d: d.isNotNull(),
    )
    return F.struct(
        F.trim(F.regexp_replace(response_text, r"\s*\[\d+\]", "")).alias("answer"),
        cited_docs.alias("cited_docs"),
    )
