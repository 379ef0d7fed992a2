set output './in.fq.kmers.per.nt.png'
set terminal png nocrop enhanced font arial 10 size 640,360
set ylabel 'Number of K-mers'
set xlabel 'Nucleotide position'
set ytics border in scale 1,0.5 mirror norotate  offset character 0, 0, 0
set title 'Relative Enrichment over Read Length'
set xrange [ 0 : 117 ] noreverse nowriteback
set autoscale y
set lmargin '10'
set rmargin '4'
set tmargin '3'
set bmargin '4'
plot './in.fq.kmers.per.nt.data' using 1:2 title 'GCGAG' with lines, './in.fq.kmers.per.nt.data' using 1:3 title 'CTCCT' with lines, './in.fq.kmers.per.nt.data' using 1:4 title 'AGTAG' with lines, './in.fq.kmers.per.nt.data' using 1:5 title 'GGCCT' with lines, './in.fq.kmers.per.nt.data' using 1:6 title 'TAGAT' with lines
