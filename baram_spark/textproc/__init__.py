"""Text processing: sanitize chain, HTML extraction, dates, analyzer."""
